package graftdb

import (
	"context"
	"net/http"
)

// CreateCollection creates a collection (distance defaults to cosine
// when empty). 409 when it already exists.
func (c *Client) CreateCollection(ctx context.Context, name string,
	dimensions int, distance string) (*CollectionInfo, error) {
	body := map[string]any{"name": name, "dimensions": dimensions}
	if distance != "" {
		body["distance"] = distance
	}
	if err := c.do(ctx, http.MethodPost, "/collections", body, nil); err != nil {
		return nil, err
	}
	return &CollectionInfo{Name: name, Dimensions: dimensions}, nil
}

// GetCollection fetches collection stats; IsNotFound(err) when absent.
func (c *Client) GetCollection(ctx context.Context, name string) (*CollectionInfo, error) {
	var out CollectionInfo
	if err := c.do(ctx, http.MethodGet,
		"/collections/"+pathEscape(name), nil, &out); err != nil {
		return nil, err
	}
	return &out, nil
}

// GetOrCreateCollection returns the existing collection or creates it.
func (c *Client) GetOrCreateCollection(ctx context.Context, name string,
	dimensions int, distance string) (*CollectionInfo, error) {
	info, err := c.GetCollection(ctx, name)
	if err == nil {
		return info, nil
	}
	if !IsNotFound(err) {
		return nil, err
	}
	return c.CreateCollection(ctx, name, dimensions, distance)
}

// ListCollections returns every collection's stats (one page of up to
// 100; the server's offset/limit params page beyond that).
func (c *Client) ListCollections(ctx context.Context) ([]CollectionInfo, error) {
	var out struct {
		Collections []CollectionInfo `json:"collections"`
	}
	if err := c.do(ctx, http.MethodGet, "/collections", nil, &out); err != nil {
		return nil, err
	}
	return out.Collections, nil
}

// DeleteCollection removes a collection; IsNotFound(err) when absent.
func (c *Client) DeleteCollection(ctx context.Context, name string) error {
	return c.do(ctx, http.MethodDelete,
		"/collections/"+pathEscape(name), nil, nil)
}

// RenameCollection moves the registry key; data is untouched.
func (c *Client) RenameCollection(ctx context.Context, name, newName string) error {
	return c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(name)+"/rename",
		map[string]any{"new_name": newName}, nil)
}

// Count returns the number of live vectors matching an optional
// metadata filter (nil counts everything).
func (c *Client) Count(ctx context.Context, collection string,
	filter map[string]any) (int64, error) {
	body := map[string]any{}
	if filter != nil {
		body["filter"] = filter
	}
	var out struct {
		Count int64 `json:"count"`
	}
	if err := c.do(ctx, http.MethodPost,
		"/collections/"+pathEscape(collection)+"/count", body, &out); err != nil {
		return 0, err
	}
	return out.Count, nil
}
