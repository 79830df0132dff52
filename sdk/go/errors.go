package graftdb

import (
	"errors"
	"fmt"
	"net/http"
)

// APIError is a server-reported error: the HTTP status plus the body's
// {"error": ..., "code": ...} fields.
type APIError struct {
	Status  int
	Code    string
	Message string
}

func (e *APIError) Error() string {
	if e.Code != "" {
		return fmt.Sprintf("graftdb: %d %s: %s", e.Status, e.Code, e.Message)
	}
	return fmt.Sprintf("graftdb: %d: %s", e.Status, e.Message)
}

// IsNotFound reports whether err is a 404 from the server.
func IsNotFound(err error) bool {
	var apiErr *APIError
	return errors.As(err, &apiErr) && apiErr.Status == http.StatusNotFound
}

// IsConflict reports whether err is a 409 (duplicate id, existing
// collection, stale ANN index).
func IsConflict(err error) bool {
	var apiErr *APIError
	return errors.As(err, &apiErr) && apiErr.Status == http.StatusConflict
}
