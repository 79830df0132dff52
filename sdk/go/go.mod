module graftdb

go 1.21
