package graftdb

import (
	"context"
	"net/http"
	"strconv"
)

// Insert adds one vector; 409 DUPLICATE_ID when the id exists (use
// Upsert to replace).
func (c *Client) Insert(ctx context.Context, collection string, v *Vector) error {
	return c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/vectors", v, nil)
}

// InsertBatch adds vectors atomically; the batch must be id-unique and
// id-disjoint from the collection. Returns the inserted count.
func (c *Client) InsertBatch(ctx context.Context, collection string,
	vs []*Vector) (int, error) {
	var out struct {
		Inserted int `json:"inserted"`
	}
	err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/vectors/batch",
		map[string]any{"vectors": vs}, &out)
	return out.Inserted, err
}

// Upsert inserts or replaces one vector by id.
func (c *Client) Upsert(ctx context.Context, collection string, v *Vector) error {
	return c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/vectors/upsert", v, nil)
}

// UpsertBatch inserts-or-replaces a batch (last occurrence of a
// duplicated id wins, matching sequential upserts). Returns the
// affected count.
func (c *Client) UpsertBatch(ctx context.Context, collection string,
	vs []*Vector) (int, error) {
	var out struct {
		Upserted int `json:"upserted"`
	}
	err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/vectors/upsert-batch",
		map[string]any{"vectors": vs}, &out)
	return out.Upserted, err
}

// GetVector fetches one vector by id; IsNotFound(err) when absent.
func (c *Client) GetVector(ctx context.Context, collection, id string) (*Vector, error) {
	var out Vector
	if err := c.do(ctx, http.MethodGet,
		"/collections/"+pathEscape(collection)+"/vectors/"+pathEscape(id),
		nil, &out); err != nil {
		return nil, err
	}
	return &out, nil
}

// DeleteVector removes one vector; IsNotFound(err) when absent.
func (c *Client) DeleteVector(ctx context.Context, collection, id string) error {
	return c.do(ctx, http.MethodDelete,
		"/collections/"+pathEscape(collection)+"/vectors/"+pathEscape(id),
		nil, nil)
}

// DeleteBatch removes vectors by id; absent ids count 0 (reference
// semantics). Returns the number actually deleted.
func (c *Client) DeleteBatch(ctx context.Context, collection string,
	ids []string) (int64, error) {
	var out struct {
		Deleted int64 `json:"deleted"`
	}
	err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/vectors/delete-batch",
		map[string]any{"ids": ids}, &out)
	return out.Deleted, err
}

// ListVectors fetches one keyset page (afterID "" starts from the
// beginning). Constant cost per page at any depth — walk
// page.Pagination.NextAfterID while HasMore.
func (c *Client) ListVectors(ctx context.Context, collection string,
	afterID string, limit int) (*VectorPage, error) {
	if limit <= 0 {
		limit = 100
	}
	path := "/collections/" + pathEscape(collection) + "/vectors?limit=" +
		strconv.Itoa(limit)
	if afterID != "" {
		path += "&after_id=" + pathEscape(afterID)
	}
	var out VectorPage
	if err := c.do(ctx, http.MethodGet, path, nil, &out); err != nil {
		return nil, err
	}
	return &out, nil
}
