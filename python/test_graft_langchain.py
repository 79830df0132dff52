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
spark.stop()
