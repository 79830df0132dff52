"""Python client for the graft engine — the needle-python stand-in.

Mirrors the reference ``needle_db`` package surface (python/needle_db/
__init__.py: ``Client`` / ``Collection`` / ``QueryResult``) over the
engine's REST contract layer, so the same calls a reference user writes
work against a graft server:

    from graft_db import Client

    client = Client("http://127.0.0.1:8080")
    coll = client.get_or_create_collection("docs", dimensions=3)
    coll.add(ids=["a", "b"], vectors=[[1, 0, 0], [0, 1, 0]],
             metadatas=[{"lang": "en"}, {"lang": "de"}])
    res = coll.query(query_vectors=[[1, 0, 0]], n_results=2,
                     where={"lang": {"$eq": "en"}})
    print(res.flatten())

The client is pure standard library (urllib) — no pyspark dependency.
Under PySpark, ``Client.local(spark)`` boots the in-process JVM server
through the Py4J gateway and returns a client bound to it (the compiled
graft classes must be on the driver classpath).
"""
from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

__all__ = ["Client", "Collection", "MemoryStore", "QueryResult",
           "GraftError", "backend"]


def backend() -> str:
    """Identify the engine behind this client (reference: ``backend()``)."""
    return "graft-spark-rest"


class GraftError(RuntimeError):
    """Server-reported error (HTTP status + the body's error code)."""

    def __init__(self, status: int, message: str, code: str = "") -> None:
        super().__init__(f"{status} {code}: {message}" if code else message)
        self.status = status
        self.code = code


class QueryResult:
    """Batched search results, one list per query (reference shape)."""

    def __init__(self) -> None:
        self.ids: List[List[str]] = []
        self.distances: List[List[float]] = []
        self.metadatas: List[List[Optional[Dict[str, Any]]]] = []

    def __len__(self) -> int:
        return len(self.ids)

    def __bool__(self) -> bool:
        return any(len(batch) > 0 for batch in self.ids)

    def __repr__(self) -> str:
        return f"QueryResult(n_queries={len(self.ids)})"

    def flatten(self) -> List[Tuple[str, float, Optional[Dict[str, Any]]]]:
        """All results as flat ``(id, distance, metadata)`` tuples."""
        out: List[Tuple[str, float, Optional[Dict[str, Any]]]] = []
        for ids, dists, metas in zip(self.ids, self.distances, self.metadatas):
            out.extend(zip(ids, dists, metas))
        return out


class _Http:
    def __init__(self, base_url: str, timeout: float) -> None:
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def call(self, method: str, path: str,
             body: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(self.base + path, data=data,
                                     method=method)
        req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = resp.read()
        except urllib.error.HTTPError as e:
            try:
                err = json.loads(e.read())
                raise GraftError(e.code, err.get("error", str(e)),
                                 err.get("code", "")) from None
            except (ValueError, KeyError):
                raise GraftError(e.code, str(e)) from None
        return json.loads(payload) if payload else {}


class Collection:
    """A named vector collection. Obtain via :meth:`Client.create_collection`
    or :meth:`Client.get_or_create_collection` (reference contract).
    """

    def __init__(self, http: _Http, name: str, dimensions: int,
                 distance: str = "cosine") -> None:
        self._http = http
        self.name = name
        self.dimensions = dimensions
        self.distance = distance

    # ------------------------------------------------------------ inserts

    def add(self, ids: Sequence[str], vectors: Sequence[Sequence[float]],
            metadatas: Optional[Sequence[Optional[Dict[str, Any]]]] = None
            ) -> int:
        """Insert vectors with optional metadata; returns inserted count."""
        if len(ids) != len(vectors):
            raise ValueError(
                f"ids ({len(ids)}) and vectors ({len(vectors)}) "
                "must have same length")
        payload = [{"id": str(vid), "vector": list(map(float, vec)),
                    **({"metadata": metadatas[i]}
                       if metadatas and i < len(metadatas) and metadatas[i]
                       is not None else {})}
                   for i, (vid, vec) in enumerate(zip(ids, vectors))]
        out = self._http.call(
            "POST", f"/collections/{self.name}/vectors/batch",
            {"vectors": payload})
        return int(out.get("inserted", len(payload)))

    def upsert(self, ids: Sequence[str], vectors: Sequence[Sequence[float]],
               metadatas: Optional[Sequence[Optional[Dict[str, Any]]]] = None
               ) -> int:
        """Insert-or-replace by id; returns affected count."""
        done = 0
        for i, (vid, vec) in enumerate(zip(ids, vectors)):
            body: Dict[str, Any] = {"id": str(vid),
                                    "vector": list(map(float, vec))}
            if metadatas and i < len(metadatas) and metadatas[i] is not None:
                body["metadata"] = metadatas[i]
            out = self._http.call(
                "POST", f"/collections/{self.name}/vectors/upsert", body)
            done += int(out.get("upserted", 1))
        return done

    # ------------------------------------------------------------- search

    def query(self, query_vectors: Sequence[Sequence[float]],
              n_results: int = 10,
              where: Optional[Dict[str, Any]] = None) -> QueryResult:
        """Search for similar vectors (MongoDB-style ``where`` filter)."""
        result = QueryResult()
        for qvec in query_vectors:
            body: Dict[str, Any] = {"vector": list(map(float, qvec)),
                                    "k": n_results}
            if where:
                body["filter"] = where
            out = self._http.call(
                "POST", f"/collections/{self.name}/search", body)
            hits = out.get("results", [])
            result.ids.append([h["id"] for h in hits])
            result.distances.append([h["distance"] for h in hits])
            result.metadatas.append([h.get("metadata") for h in hits])
        return result

    # ------------------------------------------------------------ lookups

    def get(self, ids: Sequence[str]) -> Dict[str, Any]:
        """Retrieve vectors by id → ``{ids, vectors, metadatas}``."""
        r_ids: List[str] = []
        r_vecs: List[List[float]] = []
        r_meta: List[Optional[Dict[str, Any]]] = []
        for vid in ids:
            try:
                out = self._http.call(
                    "GET", f"/collections/{self.name}/vectors/"
                           f"{urllib.parse.quote(str(vid), safe='')}")
            except GraftError as e:
                if e.status == 404:
                    continue
                raise
            r_ids.append(out["id"])
            r_vecs.append(out["vector"])
            r_meta.append(out.get("metadata"))
        return {"ids": r_ids, "vectors": r_vecs, "metadatas": r_meta}

    def delete(self, ids: Sequence[str]) -> int:
        """Delete vectors by id; returns the number deleted (absent ids
        count as 0, reference semantics).
        """
        try:
            out = self._http.call(
                "POST", f"/collections/{self.name}/vectors/delete-batch",
                {"ids": [str(v) for v in ids]})
        except GraftError as e:
            if e.status == 404:
                return 0
            raise
        return int(out.get("deleted", 0))

    def where(self, where: Dict[str, Any], limit: int = 100,
              after_id: Optional[str] = None) -> Dict[str, Any]:
        """Metadata-only query (keyset-paged); returns ``{data,
        pagination: {count, total, has_more, next_after_id}}``.
        """
        body: Dict[str, Any] = {"filter": where, "limit": limit}
        if after_id is not None:
            body["after_id"] = after_id
        return self._http.call(
            "POST", f"/collections/{self.name}/query", body)

    @property
    def count(self) -> int:
        """Number of live vectors in the collection."""
        out = self._http.call("GET", f"/collections/{self.name}")
        return int(out["count"])

    def __contains__(self, vector_id: str) -> bool:
        try:
            self._http.call(
                "GET", f"/collections/{self.name}/vectors/"
                       f"{urllib.parse.quote(str(vector_id), safe='')}")
            return True
        except GraftError as e:
            if e.status == 404:
                return False
            raise

    def __iter__(self) -> Iterator[
            Tuple[str, List[float], Optional[Dict[str, Any]]]]:
        """Iterate ``(id, vector, metadata)`` via keyset pages — constant
        cost per page at any depth (no offset scans).
        """
        after: Optional[str] = None
        while True:
            params = {"limit": 500}
            if after is not None:
                params["after_id"] = after
            path = (f"/collections/{self.name}/vectors?"
                    f"{urllib.parse.urlencode(params)}")
            page = self._http.call("GET", path)
            data = page.get("vectors", [])
            for row in data:
                yield row["id"], row.get("vector", []), row.get("metadata")
            pagination = page.get("pagination", {})
            if not pagination.get("has_more") or not data:
                return
            after = pagination.get("next_after_id", data[-1]["id"])

    def __len__(self) -> int:
        return self.count

    def __repr__(self) -> str:
        return (f"Collection(name='{self.name}', "
                f"dimensions={self.dimensions})")


class MemoryStore:
    """Agentic memory over a collection (reference ``needle_db.MemoryStore``):
    memories are vectors whose metadata carries content, tier, importance,
    and an optional session scope, so recall is a filtered similarity
    search on the same engine path as any other query.
    """

    _seq = 0

    def __init__(self, collection: Collection) -> None:
        self.collection = collection

    def remember(self, content: str, vector: Sequence[float],
                 tier: str = "episodic", importance: float = 0.5,
                 session_id: Optional[str] = None,
                 metadata: Optional[Dict[str, Any]] = None) -> str:
        """Store one memory; returns its generated id."""
        import time
        MemoryStore._seq += 1
        memory_id = f"mem_{int(time.time() * 1000)}_{MemoryStore._seq}"
        meta = dict(metadata or {})
        meta.update({"_memory_content": content, "_memory_tier": tier,
                     "_memory_importance": importance,
                     "_memory_timestamp": time.time()})
        if session_id:
            meta["_memory_session"] = session_id
        self.collection.add(ids=[memory_id], vectors=[list(vector)],
                            metadatas=[meta])
        return memory_id

    def recall(self, query: Sequence[float], k: int = 5,
               tier: Optional[str] = None,
               min_importance: Optional[float] = None,
               session_id: Optional[str] = None) -> List[Dict[str, Any]]:
        """Similarity recall with optional tier/importance/session filters."""
        clauses: List[Dict[str, Any]] = []
        if tier:
            clauses.append({"_memory_tier": {"$eq": tier}})
        if min_importance is not None:
            clauses.append({"_memory_importance": {"$gte": min_importance}})
        if session_id:
            clauses.append({"_memory_session": {"$eq": session_id}})
        where: Optional[Dict[str, Any]] = None
        if len(clauses) == 1:
            where = clauses[0]
        elif clauses:
            where = {"$and": clauses}
        res = self.collection.query([list(query)], n_results=k, where=where)
        out: List[Dict[str, Any]] = []
        for i, mid in enumerate(res.ids[0] if res.ids else []):
            meta = (res.metadatas[0][i] or {}) if res.metadatas[0] else {}
            out.append({"memory_id": mid,
                        "distance": res.distances[0][i],
                        "content": meta.get("_memory_content"),
                        "tier": meta.get("_memory_tier"),
                        "importance": meta.get("_memory_importance")})
        return out

    def forget(self, memory_id: str) -> bool:
        """Delete one memory; True when it existed."""
        return self.collection.delete([memory_id]) > 0


class Client:
    """Client for a graft REST server (reference ``needle_db.Client``).

    ``Client("http://host:port")`` attaches to a running server.
    ``Client.local(spark)`` boots one in-process via the Py4J gateway.
    """

    def __init__(self, url: str, timeout: float = 30.0) -> None:
        self._http = _Http(url, timeout)
        self._server = None  # JVM handle when booted via .local()

    # --------------------------------------------------- lifecycle helpers

    @classmethod
    def local(cls, spark: Any, port: int = 0,
              timeout: float = 30.0) -> "Client":
        """Start the engine's in-process REST server on this PySpark
        session's JVM and return a client bound to it.
        """
        api = spark._jvm.graft.server.RestApi(spark._jsparkSession)
        server = api.serve(port)
        bound = server.getAddress().getPort()
        client = cls(f"http://127.0.0.1:{bound}", timeout=timeout)
        client._server = server
        return client

    def close(self) -> None:
        if self._server is not None:
            self._server.stop(0)
            self._server = None

    def __enter__(self) -> "Client":
        return self

    def __exit__(self, exc_type: Any, exc_val: Any, exc_tb: Any) -> None:
        self.close()

    # ----------------------------------------------------- collection mgmt

    def health(self) -> bool:
        return self._http.call("GET", "/health").get("status") == "ok"

    def create_collection(self, name: str, dimensions: int,
                          distance: str = "cosine") -> Collection:
        self._http.call("POST", "/collections",
                        {"name": name, "dimensions": dimensions,
                         "distance": distance})
        return Collection(self._http, name, dimensions, distance)

    def get_collection(self, name: str) -> Optional[Collection]:
        try:
            out = self._http.call("GET", f"/collections/{name}")
        except GraftError as e:
            if e.status == 404:
                return None
            raise
        return Collection(self._http, name, int(out["dimensions"]))

    def get_or_create_collection(self, name: str, dimensions: int,
                                 distance: str = "cosine") -> Collection:
        existing = self.get_collection(name)
        if existing is not None:
            return existing
        return self.create_collection(name, dimensions, distance)

    def list_collections(self) -> List[str]:
        out = self._http.call("GET", "/collections")
        return [c["name"] if isinstance(c, dict) else c
                for c in out.get("collections", [])]

    def delete_collection(self, name: str) -> None:
        self._http.call("DELETE", f"/collections/{name}")

    def memory(self, collection_name: str, dimensions: int) -> MemoryStore:
        """Agentic memory store over a (created-if-missing) collection."""
        return MemoryStore(
            self.get_or_create_collection(collection_name, dimensions))

    def __repr__(self) -> str:
        return f"Client(url='{self._http.base}')"
