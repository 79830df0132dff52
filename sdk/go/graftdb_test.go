package graftdb

// Round-trip tests against a stub server speaking the same JSON
// documents RestApiSpec pins. This sandbox ships no Go toolchain, so
// these cannot run here — they exist so `go test ./...` validates the
// client anywhere one is available.

import (
	"context"
	"encoding/json"
	"net/http"
	"net/http/httptest"
	"testing"
)

func stubServer(t *testing.T) *httptest.Server {
	t.Helper()
	mux := http.NewServeMux()
	mux.HandleFunc("/health", func(w http.ResponseWriter, r *http.Request) {
		_ = json.NewEncoder(w).Encode(map[string]any{"status": "ok"})
	})
	mux.HandleFunc("/collections", func(w http.ResponseWriter, r *http.Request) {
		if r.Method == http.MethodPost {
			w.WriteHeader(http.StatusCreated)
			_ = json.NewEncoder(w).Encode(map[string]any{"created": "docs"})
			return
		}
		_ = json.NewEncoder(w).Encode(map[string]any{
			"collections": []map[string]any{{
				"name": "docs", "dimensions": 3, "count": 2,
				"deleted_count": 0}}})
	})
	mux.HandleFunc("/collections/docs", func(w http.ResponseWriter, r *http.Request) {
		_ = json.NewEncoder(w).Encode(map[string]any{
			"name": "docs", "dimensions": 3, "count": 2,
			"deleted_count": 0, "needs_compaction": false})
	})
	mux.HandleFunc("/collections/missing", func(w http.ResponseWriter, r *http.Request) {
		w.WriteHeader(http.StatusNotFound)
		_ = json.NewEncoder(w).Encode(map[string]any{
			"error": "Collection not found: missing", "code": "NOT_FOUND"})
	})
	mux.HandleFunc("/collections/docs/vectors/batch", func(w http.ResponseWriter, r *http.Request) {
		var body struct {
			Vectors []Vector `json:"vectors"`
		}
		if err := json.NewDecoder(r.Body).Decode(&body); err != nil {
			t.Errorf("batch decode: %v", err)
		}
		_ = json.NewEncoder(w).Encode(map[string]any{
			"inserted": len(body.Vectors)})
	})
	mux.HandleFunc("/collections/docs/search", func(w http.ResponseWriter, r *http.Request) {
		var opts SearchOptions
		if err := json.NewDecoder(r.Body).Decode(&opts); err != nil {
			t.Errorf("search decode: %v", err)
		}
		if len(opts.Vector) != 3 || opts.K != 2 {
			t.Errorf("search body unexpected: %+v", opts)
		}
		_ = json.NewEncoder(w).Encode(map[string]any{
			"results": []map[string]any{
				{"id": "a", "distance": 0.0, "score": 1.0,
					"metadata": map[string]any{"lang": "en"}},
				{"id": "b", "distance": 0.5, "score": 0.6667},
			}})
	})
	return httptest.NewServer(mux)
}

func TestClientRoundTrip(t *testing.T) {
	srv := stubServer(t)
	defer srv.Close()
	ctx := context.Background()
	c := NewClient(srv.URL)

	if ok, err := c.Health(ctx); err != nil || !ok {
		t.Fatalf("health: %v %v", ok, err)
	}
	if _, err := c.CreateCollection(ctx, "docs", 3, "cosine"); err != nil {
		t.Fatalf("create: %v", err)
	}
	info, err := c.GetCollection(ctx, "docs")
	if err != nil || info.Dimensions != 3 || info.Count != 2 {
		t.Fatalf("get: %+v %v", info, err)
	}
	if _, err := c.GetCollection(ctx, "missing"); !IsNotFound(err) {
		t.Fatalf("missing should be NotFound, got %v", err)
	}
	n, err := c.InsertBatch(ctx, "docs", []*Vector{
		{ID: "a", Values: []float32{1, 0, 0},
			Metadata: map[string]any{"lang": "en"}},
		{ID: "b", Values: []float32{0, 1, 0}},
	})
	if err != nil || n != 2 {
		t.Fatalf("insert batch: %d %v", n, err)
	}
	resp, err := c.Search(ctx, "docs", SearchOptions{
		Vector: []float32{1, 0, 0}, K: 2})
	if err != nil || len(resp.Results) != 2 {
		t.Fatalf("search: %+v %v", resp, err)
	}
	if resp.Results[0].ID != "a" || resp.Results[0].Metadata["lang"] != "en" {
		t.Fatalf("hit decode: %+v", resp.Results[0])
	}
}

func TestRetryOn500(t *testing.T) {
	attempts := 0
	srv := httptest.NewServer(http.HandlerFunc(
		func(w http.ResponseWriter, r *http.Request) {
			attempts++
			if attempts < 3 {
				w.WriteHeader(http.StatusInternalServerError)
				_ = json.NewEncoder(w).Encode(map[string]any{
					"error": "transient", "code": "INTERNAL"})
				return
			}
			_ = json.NewEncoder(w).Encode(map[string]any{"status": "ok"})
		}))
	defer srv.Close()
	c := NewClient(srv.URL, WithMaxRetries(3))
	ok, err := c.Health(context.Background())
	if err != nil || !ok || attempts != 3 {
		t.Fatalf("retry: ok=%v attempts=%d err=%v", ok, attempts, err)
	}
}
