"""LangChain-style VectorStore adapter for the graft engine.

Mirrors the reference ``needle_langchain`` package surface (a
dependency-free adapter: it defines the same ``Document`` /
embedding-function protocol LangChain uses, so it plugs into LangChain
pipelines while remaining importable without langchain installed).
Backed by :mod:`graft_db` (the REST client), so every search runs on the
engine — no client-side scans.

    from graft_db import Client
    from graft_langchain import GraftVectorStore

    store = GraftVectorStore.from_texts(
        ["spark streams", "duck typing"], embedding=my_embedder,
        client=Client("http://127.0.0.1:8080"), collection_name="lc")
    docs = store.similarity_search("streaming", k=2)
"""
from __future__ import annotations

import uuid
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from graft_db import Client, Collection

__all__ = ["Document", "GraftVectorStore"]


class Document:
    """Minimal LangChain-compatible document (page_content + metadata)."""

    def __init__(self, page_content: str = "",
                 metadata: Optional[Dict[str, Any]] = None) -> None:
        self.page_content = page_content
        self.metadata = metadata or {}

    def __repr__(self) -> str:
        return f"Document(page_content={self.page_content!r})"

    def __eq__(self, other: Any) -> bool:
        return (isinstance(other, Document)
                and other.page_content == self.page_content
                and other.metadata == self.metadata)


# An embedding function is anything with embed_documents/embed_query
# (the LangChain Embeddings protocol) or a plain callable text -> vector.
EmbeddingLike = Any

_CONTENT_KEY = "_lc_content"


def _embed_many(embedding: EmbeddingLike,
                texts: Sequence[str]) -> List[List[float]]:
    if hasattr(embedding, "embed_documents"):
        return [list(map(float, v))
                for v in embedding.embed_documents(list(texts))]
    return [list(map(float, embedding(t))) for t in texts]


def _embed_one(embedding: EmbeddingLike, text: str) -> List[float]:
    if hasattr(embedding, "embed_query"):
        return list(map(float, embedding.embed_query(text)))
    return list(map(float, embedding(text)))


class GraftVectorStore:
    """VectorStore over a graft collection (reference NeedleVectorStore)."""

    def __init__(self, client: Client, collection_name: str,
                 embedding: EmbeddingLike, dimensions: int,
                 distance: str = "cosine") -> None:
        self.client = client
        self.embedding = embedding
        self.collection: Collection = client.get_or_create_collection(
            collection_name, dimensions, distance)

    # ------------------------------------------------------- constructors

    @classmethod
    def from_texts(cls, texts: Sequence[str], embedding: EmbeddingLike,
                   client: Client, collection_name: str = "langchain",
                   metadatas: Optional[Sequence[Dict[str, Any]]] = None,
                   ids: Optional[Sequence[str]] = None,
                   distance: str = "cosine") -> "GraftVectorStore":
        vectors = _embed_many(embedding, texts)
        if not vectors:
            raise ValueError("from_texts requires at least one text")
        store = cls(client, collection_name, embedding,
                    dimensions=len(vectors[0]), distance=distance)
        store.add_texts(texts, metadatas=metadatas, ids=ids,
                        _vectors=vectors)
        return store

    @classmethod
    def from_documents(cls, documents: Sequence[Document],
                       embedding: EmbeddingLike, client: Client,
                       collection_name: str = "langchain",
                       distance: str = "cosine") -> "GraftVectorStore":
        return cls.from_texts([d.page_content for d in documents],
                              embedding, client, collection_name,
                              metadatas=[d.metadata for d in documents],
                              distance=distance)

    # ------------------------------------------------------------ inserts

    def add_texts(self, texts: Sequence[str],
                  metadatas: Optional[Sequence[Dict[str, Any]]] = None,
                  ids: Optional[Sequence[str]] = None,
                  _vectors: Optional[List[List[float]]] = None) -> List[str]:
        """Embed and insert texts; returns the assigned ids."""
        vectors = _vectors if _vectors is not None else _embed_many(
            self.embedding, texts)
        if ids is None:
            # uuid4, not count-based: after a deletion the live count shrinks
            # and count-derived ids collide with (and upsert over) existing
            # unrelated documents
            ids = [f"doc_{uuid.uuid4().hex}" for _ in range(len(texts))]
        metas = []
        for i, text in enumerate(texts):
            m = dict(metadatas[i]) if metadatas and i < len(metadatas) else {}
            m[_CONTENT_KEY] = text
            metas.append(m)
        self.collection.upsert(ids=list(ids), vectors=vectors,
                               metadatas=metas)
        return list(ids)

    # ------------------------------------------------------------- search

    def similarity_search_with_score(
            self, query: str, k: int = 4,
            filter: Optional[Dict[str, Any]] = None
    ) -> List[Tuple[Document, float]]:
        """Top-k documents with engine distances (lower = closer)."""
        qv = _embed_one(self.embedding, query)
        res = self.collection.query([qv], n_results=k, where=filter)
        out: List[Tuple[Document, float]] = []
        for doc_id, dist, meta in res.flatten():
            meta = dict(meta or {})
            content = meta.pop(_CONTENT_KEY, "")
            meta["_id"] = doc_id
            out.append((Document(content, meta), dist))
        return out

    def similarity_search(self, query: str, k: int = 4,
                          filter: Optional[Dict[str, Any]] = None
                          ) -> List[Document]:
        return [d for d, _ in self.similarity_search_with_score(
            query, k, filter)]

    def max_marginal_relevance_search(
            self, query: str, k: int = 4, fetch_k: int = 20,
            lambda_mult: float = 0.5) -> List[Document]:
        """MMR re-rank: fetch ``fetch_k`` candidates from the engine, then
        greedily trade relevance against diversity client-side (the pool
        is k-bounded, so this stays a driver-side loop by design).
        """
        qv = _embed_one(self.embedding, query)
        res = self.collection.query([qv], n_results=fetch_k)
        ids = res.ids[0] if res.ids else []
        if not ids:
            return []
        got = self.collection.get(ids)
        vecs = {i: v for i, v in zip(got["ids"], got["vectors"])}
        metas = {i: m for i, m in zip(got["ids"], got["metadatas"])}

        def cos_sim(a: Sequence[float], b: Sequence[float]) -> float:
            dot = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a) ** 0.5
            nb = sum(y * y for y in b) ** 0.5
            return dot / (na * nb) if na and nb else 0.0

        rel = {i: cos_sim(qv, vecs[i]) for i in ids if i in vecs}
        selected: List[str] = []
        candidates = [i for i in ids if i in vecs]
        while candidates and len(selected) < k:
            best, best_score = None, float("-inf")
            for c in candidates:
                diversity = max((cos_sim(vecs[c], vecs[s])
                                 for s in selected), default=0.0)
                score = lambda_mult * rel[c] - (1 - lambda_mult) * diversity
                if score > best_score:
                    best, best_score = c, score
            selected.append(best)
            candidates.remove(best)
        docs = []
        for i in selected:
            meta = dict(metas.get(i) or {})
            content = meta.pop(_CONTENT_KEY, "")
            meta["_id"] = i
            docs.append(Document(content, meta))
        return docs

    # ------------------------------------------------------------ lookups

    def get_by_id(self, doc_id: str) -> Optional[Document]:
        got = self.collection.get([doc_id])
        if not got["ids"]:
            return None
        meta = dict(got["metadatas"][0] or {})
        content = meta.pop(_CONTENT_KEY, "")
        meta["_id"] = doc_id
        return Document(content, meta)

    def delete(self, ids: Sequence[str]) -> bool:
        return self.collection.delete(ids) > 0

    @property
    def count(self) -> int:
        return self.collection.count

    def as_retriever(self, k: int = 4) -> Callable[[str], List[Document]]:
        """Plain-callable retriever (LangChain's retriever protocol is a
        callable over query text in its simplest form).
        """
        return lambda query: self.similarity_search(query, k=k)
