#!/usr/bin/env python3
"""Smoke for the LangChain-style adapter (run via spark-submit with the
compiled graft classes on the driver classpath):

    spark-submit --driver-class-path target/scala-2.13/classes \
        python/test_graft_langchain.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from graft_db import Client
from graft_langchain import Document, GraftVectorStore

spark = (SparkSession.builder
         .appName("graft-langchain-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.artifact.isolation.enabled", "false")
         .getOrCreate())


def embed(text):
    """Deterministic toy embedding: topic-marker counts."""
    t = text.lower()
    return [float(t.count("spark")), float(t.count("duck")),
            float(t.count("graph"))]


with Client.local(spark) as client:
    store = GraftVectorStore.from_texts(
        ["spark spark streaming", "duck db oracle", "graph of entities",
         "spark sql engine"],
        embedding=embed, client=client, collection_name="lc",
        metadatas=[{"topic": "spark"}, {"topic": "duck"},
                   {"topic": "graph"}, {"topic": "spark"}])
    assert store.count == 4

    # nearest by topic marker; content round-trips through metadata
    docs = store.similarity_search("tell me about spark", k=2)
    assert all(isinstance(d, Document) for d in docs)
    assert docs[0].page_content in ("spark spark streaming",
                                    "spark sql engine"), docs
    assert docs[0].metadata["topic"] == "spark"

    # scores are engine distances, ascending
    scored = store.similarity_search_with_score("duck typing", k=3)
    assert scored[0][0].page_content == "duck db oracle"
    assert scored[0][1] <= scored[1][1] <= scored[2][1]

    # metadata filter narrows the candidate set server-side
    only_graph = store.similarity_search(
        "anything", k=4, filter={"topic": {"$eq": "graph"}})
    assert [d.page_content for d in only_graph] == ["graph of entities"]

    # MMR: first pick is the most relevant; at a diversity-dominant
    # lambda the second spark doc (cosine 1.0 to the first) scores
    # rel*l - sim*(1-l) = -0.4 while the orthogonal graph doc scores 0,
    # so the second pick switches topic
    mmr = store.max_marginal_relevance_search(
        "spark", k=2, fetch_k=4, lambda_mult=0.3)
    assert mmr[0].metadata["topic"] == "spark"
    assert mmr[1].metadata["topic"] != "spark", mmr

    # lookups + delete
    ids = store.add_texts(["one more spark doc"], ids=["extra"])
    assert ids == ["extra"]
    got = store.get_by_id("extra")
    assert got is not None and got.page_content == "one more spark doc"
    assert store.get_by_id("nope") is None
    assert store.delete(["extra"]) and store.count == 4

    # retriever protocol
    retriever = store.as_retriever(k=1)
    assert retriever("duck")[0].page_content == "duck db oracle"

    # from_documents round-trip
    store2 = GraftVectorStore.from_documents(
        [Document("spark on duck", {"k": "v"})], embed, client,
        collection_name="lc2")
    assert store2.count == 1
    assert store2.similarity_search("x", k=1)[0].metadata["k"] == "v"

print("graft_langchain smoke OK")

# ------------------------------------------------- llamaindex adapter
from graft_llamaindex import GraftVectorStoreIndex, TextNode

with Client.local(spark) as client:
    index = GraftVectorStoreIndex.from_nodes(
        [TextNode("alpha", id_="a", metadata={"kind": "x"},
                  embedding=[1.0, 0.0]),
         TextNode("beta", id_="b", metadata={"kind": "y"},
                  embedding=[0.0, 1.0]),
         TextNode("alpha prime", id_="c", metadata={"kind": "x"},
                  embedding=[0.9, 0.1])],
        client=client, collection_name="li")
    assert index.count == 3

    hits = index.query([1.0, 0.0], similarity_top_k=2)
    assert [h.node.id_ for h in hits] == ["a", "c"], hits
    assert hits[0].score >= hits[1].score
    assert hits[0].node.text == "alpha"
    assert hits[0].node.metadata == {"kind": "x"}

    only_y = index.query([1.0, 0.0], similarity_top_k=3,
                         filters={"kind": {"$eq": "y"}})
    assert [h.node.id_ for h in only_y] == ["b"]

    node = index.get_by_id("b")
    assert node is not None and node.text == "beta"
    assert node.embedding == [0.0, 1.0]
    assert index.get_by_id("zz") is None

    # unembedded nodes are rejected
    try:
        index.add([TextNode("nope", id_="z")])
        raise AssertionError("missing embedding not rejected")
    except ValueError:
        pass

    index.delete("a")
    assert index.count == 2
    retriever = index.as_retriever(similarity_top_k=1)
    assert retriever([0.0, 1.0])[0].node.id_ == "b"

print("graft_llamaindex smoke OK")
spark.stop()
