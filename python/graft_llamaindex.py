"""LlamaIndex-style vector index adapter for the graft engine.

Mirrors the reference ``needle_llamaindex`` package surface (TextNode /
NodeWithScore / a vector-store index over pre-embedded nodes) on top of
:mod:`graft_db`, so LlamaIndex-shaped pipelines drive the engine without
any llamaindex dependency. Nodes carry their own embeddings (LlamaIndex
computes embeddings upstream); scores are similarities (1 - distance),
descending.

    from graft_db import Client
    from graft_llamaindex import TextNode, GraftVectorStoreIndex

    index = GraftVectorStoreIndex.from_nodes(
        [TextNode("doc", id_="a", embedding=[1, 0])],
        client=Client("http://127.0.0.1:8080"), collection_name="li")
    hits = index.query([1, 0], similarity_top_k=3)
"""
from __future__ import annotations

import uuid
from typing import Any, Dict, List, Optional, Sequence

from graft_db import Client, Collection

__all__ = ["TextNode", "NodeWithScore", "GraftVectorStoreIndex"]

_TEXT_KEY = "_li_text"


class TextNode:
    """LlamaIndex-compatible text node (text + id + metadata + embedding)."""

    def __init__(self, text: str = "", id_: Optional[str] = None,
                 metadata: Optional[Dict[str, Any]] = None,
                 embedding: Optional[List[float]] = None) -> None:
        self.text = text
        self.id_ = id_ or str(uuid.uuid4())
        self.metadata = metadata or {}
        self.embedding = embedding

    def __repr__(self) -> str:
        return f"TextNode(id_={self.id_!r}, text={self.text!r})"


class NodeWithScore:
    """A node paired with its relevance score (similarity, higher=better)."""

    def __init__(self, node: TextNode, score: float = 0.0) -> None:
        self.node = node
        self.score = score

    def __repr__(self) -> str:
        return f"NodeWithScore(id_={self.node.id_!r}, score={self.score:.4f})"


class GraftVectorStoreIndex:
    """Vector index over pre-embedded nodes (reference
    NeedleVectorStoreIndex), server-backed: every query runs on the
    engine, nothing is scanned client-side.
    """

    def __init__(self, client: Client, collection_name: str,
                 dimensions: int, distance: str = "cosine") -> None:
        self.collection: Collection = client.get_or_create_collection(
            collection_name, dimensions, distance)

    @classmethod
    def from_nodes(cls, nodes: Sequence[TextNode], client: Client,
                   collection_name: str = "llamaindex",
                   distance: str = "cosine") -> "GraftVectorStoreIndex":
        embedded = [n for n in nodes if n.embedding is not None]
        if not embedded:
            raise ValueError("from_nodes requires at least one embedded node")
        index = cls(client, collection_name,
                    dimensions=len(embedded[0].embedding),
                    distance=distance)
        index.add(embedded)
        return index

    def add(self, nodes: Sequence[TextNode]) -> List[str]:
        """Insert embedded nodes; returns their ids. Nodes without an
        embedding are rejected (LlamaIndex embeds upstream).
        """
        missing = [n.id_ for n in nodes if n.embedding is None]
        if missing:
            raise ValueError(f"nodes missing embeddings: {missing}")
        metas = []
        for n in nodes:
            m = dict(n.metadata)
            m[_TEXT_KEY] = n.text
            metas.append(m)
        self.collection.upsert(
            ids=[n.id_ for n in nodes],
            vectors=[list(map(float, n.embedding)) for n in nodes],
            metadatas=metas)
        return [n.id_ for n in nodes]

    def query(self, query_embedding: Sequence[float],
              similarity_top_k: int = 10,
              filters: Optional[Dict[str, Any]] = None
              ) -> List[NodeWithScore]:
        """Top-k nodes by similarity (1 - engine distance), descending."""
        res = self.collection.query([list(map(float, query_embedding))],
                                    n_results=similarity_top_k,
                                    where=filters)
        out: List[NodeWithScore] = []
        for node_id, dist, meta in res.flatten():
            meta = dict(meta or {})
            text = meta.pop(_TEXT_KEY, "")
            out.append(NodeWithScore(
                TextNode(text, id_=node_id, metadata=meta),
                score=1.0 - dist))
        return out

    def get_by_id(self, node_id: str) -> Optional[TextNode]:
        got = self.collection.get([node_id])
        if not got["ids"]:
            return None
        meta = dict(got["metadatas"][0] or {})
        text = meta.pop(_TEXT_KEY, "")
        return TextNode(text, id_=node_id, metadata=meta,
                        embedding=got["vectors"][0])

    def delete(self, node_id: str) -> None:
        self.collection.delete([node_id])

    @property
    def count(self) -> int:
        return self.collection.count

    def as_retriever(self, similarity_top_k: int = 10):
        """Callable retriever over a query embedding."""
        return lambda qv: self.query(qv, similarity_top_k=similarity_top_k)
