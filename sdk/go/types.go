package graftdb

// Vector is one stored row: string id, float32 values, optional JSON
// metadata, optional TTL (seconds from insert).
type Vector struct {
	ID         string         `json:"id"`
	Values     []float32      `json:"vector"`
	Metadata   map[string]any `json:"metadata,omitempty"`
	TTLSeconds int64          `json:"ttl_seconds,omitempty"`
}

// CollectionInfo is GET /collections/{name}.
type CollectionInfo struct {
	Name            string `json:"name"`
	Dimensions      int    `json:"dimensions"`
	Count           int64  `json:"count"`
	DeletedCount    int64  `json:"deleted_count"`
	NeedsCompaction bool   `json:"needs_compaction"`
}

// SearchOptions configures POST /collections/{name}/search.
type SearchOptions struct {
	Vector []float32 `json:"vector"`
	K      int       `json:"k,omitempty"`
	// Distance overrides the collection metric for this query
	// (exact mode only; ann mode serves the index metric).
	Distance string `json:"distance,omitempty"`
	// Filter is a MongoDB-style metadata predicate applied BEFORE
	// scoring; PostFilter applies after (over-fetching by
	// PostFilterFactor * K candidates).
	Filter           map[string]any `json:"filter,omitempty"`
	PostFilter       map[string]any `json:"post_filter,omitempty"`
	PostFilterFactor int            `json:"post_filter_factor,omitempty"`
	IncludeVectors   bool           `json:"include_vectors,omitempty"`
	// Mode "ann" answers from the server's LocalServe snapshot
	// (POST /collections/{name}/index first); default exact.
	Mode string `json:"mode,omitempty"`
	// NProbe widens the ann probe (ann mode only).
	NProbe int `json:"nprobe,omitempty"`
	// Kernel "simd" opts the ann path into the f32 SIMD scoring
	// kernel (recall-contracted rather than bit-identical).
	Kernel string `json:"kernel,omitempty"`
	// SearchAfter resumes a cursor walk from the previous page's last
	// hit: {"distance": d, "id": id}.
	SearchAfter map[string]any `json:"search_after,omitempty"`
}

// SearchHit is one search/radius/recommend result row.
type SearchHit struct {
	ID       string         `json:"id"`
	Distance float64        `json:"distance"`
	Score    float64        `json:"score"`
	Metadata map[string]any `json:"metadata,omitempty"`
	Vector   []float32      `json:"vector,omitempty"`
}

// SearchResponse is the exact/ann search response.
type SearchResponse struct {
	Results []SearchHit `json:"results"`
	Mode    string      `json:"mode,omitempty"`
	NProbe  int         `json:"nprobe,omitempty"`
}

// Pagination is the keyset/offset paging envelope shared by the listing
// and metadata-query routes.
type Pagination struct {
	Count       int    `json:"count"`
	Offset      int    `json:"offset"`
	Total       int64  `json:"total"`
	HasMore     bool   `json:"has_more"`
	NextAfterID string `json:"next_after_id,omitempty"`
}

// VectorPage is GET /collections/{name}/vectors.
type VectorPage struct {
	Vectors    []Vector   `json:"vectors"`
	Pagination Pagination `json:"pagination"`
}

// MetadataRow is one POST /collections/{name}/query result.
type MetadataRow struct {
	ID       string         `json:"id"`
	Metadata map[string]any `json:"metadata"`
}

// MetadataPage is the metadata-query response.
type MetadataPage struct {
	Data       []MetadataRow `json:"data"`
	Pagination Pagination    `json:"pagination"`
}

// IndexStatus is GET /collections/{name}/index.
type IndexStatus struct {
	Built    bool  `json:"built"`
	Rows     int64 `json:"rows,omitempty"`
	NumCells int   `json:"num_cells,omitempty"`
	NProbe   int   `json:"nprobe,omitempty"`
}
