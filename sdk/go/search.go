package graftdb

import (
	"context"
	"net/http"
)

// Search runs one exact or ann similarity query.
func (c *Client) Search(ctx context.Context, collection string,
	opts SearchOptions) (*SearchResponse, error) {
	var out SearchResponse
	if err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/search", opts, &out); err != nil {
		return nil, err
	}
	return &out, nil
}

// BatchSearch scores every query vector in ONE server pass (the
// engine's bounded batch top-k); results[i] answers vectors[i].
func (c *Client) BatchSearch(ctx context.Context, collection string,
	vectors [][]float32, k int, filter map[string]any) ([][]SearchHit, error) {
	body := map[string]any{"vectors": vectors, "k": k}
	if filter != nil {
		body["filter"] = filter
	}
	var out struct {
		Results [][]SearchHit `json:"results"`
	}
	if err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/search/batch",
		body, &out); err != nil {
		return nil, err
	}
	return out.Results, nil
}

// RadiusSearch returns every vector within maxDistance (up to limit).
func (c *Client) RadiusSearch(ctx context.Context, collection string,
	vector []float32, maxDistance float64, limit int,
	filter map[string]any) ([]SearchHit, error) {
	body := map[string]any{"vector": vector, "max_distance": maxDistance}
	if limit > 0 {
		body["limit"] = limit
	}
	if filter != nil {
		body["filter"] = filter
	}
	var out struct {
		Results []SearchHit `json:"results"`
		Count   int         `json:"count"`
	}
	if err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/search/radius",
		body, &out); err != nil {
		return nil, err
	}
	return out.Results, nil
}

// Recommend searches by example ids: near the positives, pushed away
// from the negatives (the reference's recommendation API).
func (c *Client) Recommend(ctx context.Context, collection string,
	positiveIDs, negativeIDs []string, limit int) ([]SearchHit, error) {
	body := map[string]any{"positive_ids": positiveIDs}
	if len(negativeIDs) > 0 {
		body["negative_ids"] = negativeIDs
	}
	if limit > 0 {
		body["limit"] = limit
	}
	var out struct {
		Results []SearchHit `json:"results"`
	}
	if err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/recommend",
		body, &out); err != nil {
		return nil, err
	}
	return out.Results, nil
}

// Query pages metadata-only results for a filter. afterID "" +
// offset 0 starts at the beginning; keyset (afterID) paging is the
// scale path.
func (c *Client) Query(ctx context.Context, collection string,
	filter map[string]any, limit, offset int, afterID string) (*MetadataPage, error) {
	body := map[string]any{"filter": filter}
	if limit > 0 {
		body["limit"] = limit
	}
	if offset > 0 {
		body["offset"] = offset
	}
	if afterID != "" {
		body["after_id"] = afterID
	}
	var out MetadataPage
	if err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/query", body, &out); err != nil {
		return nil, err
	}
	return &out, nil
}

// BuildIndex (re)builds the server-side ANN snapshot; after it returns,
// SearchOptions{Mode: "ann"} answers in-process. Any mutation
// invalidates the snapshot (409 NO_INDEX until rebuilt).
func (c *Client) BuildIndex(ctx context.Context, collection string,
	numCells, nprobe int) (*IndexStatus, error) {
	body := map[string]any{}
	if numCells > 0 {
		body["num_cells"] = numCells
	}
	if nprobe > 0 {
		body["nprobe"] = nprobe
	}
	var out struct {
		Indexed  int64 `json:"indexed"`
		NumCells int   `json:"num_cells"`
		NProbe   int   `json:"nprobe"`
	}
	if err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/index", body, &out); err != nil {
		return nil, err
	}
	return &IndexStatus{Built: true, Rows: out.Indexed,
		NumCells: out.NumCells, NProbe: out.NProbe}, nil
}

// IndexStatus reports whether the ANN snapshot is live.
func (c *Client) IndexStatus(ctx context.Context, collection string) (*IndexStatus, error) {
	var out IndexStatus
	if err := c.do(ctx, http.MethodGet,
		"/collections/"+pathEscape(collection)+"/index", nil, &out); err != nil {
		return nil, err
	}
	return &out, nil
}

// DropIndex discards the ANN snapshot (idempotent).
func (c *Client) DropIndex(ctx context.Context, collection string) error {
	return c.do(ctx, http.MethodDelete,
		"/collections/"+pathEscape(collection)+"/index", nil, nil)
}
