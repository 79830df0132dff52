#!/usr/bin/env python3
"""End-to-end smoke for the graft_db Python client (run via spark-submit
with the compiled graft classes on the driver classpath):

    spark-submit --driver-class-path target/scala-2.13/classes \
        python/test_graft_db.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from graft_db import Client, GraftError, QueryResult, backend

spark = (SparkSession.builder
         .appName("graft-db-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.artifact.isolation.enabled", "false")
         .getOrCreate())

assert backend() == "graft-spark-rest"

with Client.local(spark) as client:
    assert client.health()

    # collection management
    coll = client.get_or_create_collection("notes", dimensions=3)
    assert client.list_collections() == ["notes"]
    assert client.get_collection("missing") is None
    assert client.get_or_create_collection("notes", dimensions=3).name == "notes"

    # inserts + count + contains
    n = coll.add(ids=["a", "b", "c"],
                 vectors=[[1, 0, 0], [0, 1, 0], [0.9, 0.1, 0]],
                 metadatas=[{"lang": "en"}, {"lang": "de"}, {"lang": "en"}])
    assert n == 3
    assert coll.count == 3 and len(coll) == 3
    assert "a" in coll and "zz" not in coll

    # mismatched lengths rejected client-side
    try:
        coll.add(ids=["x"], vectors=[[1, 0, 0], [0, 1, 0]])
        raise AssertionError("length mismatch not raised")
    except ValueError:
        pass

    # filtered query: only the two en docs, nearest first
    res = coll.query(query_vectors=[[1, 0, 0]], n_results=2,
                     where={"lang": {"$eq": "en"}})
    assert isinstance(res, QueryResult) and bool(res)
    assert res.ids == [["a", "c"]], res.ids
    assert res.distances[0][0] < res.distances[0][1]
    assert res.metadatas[0][0]["lang"] == "en"
    flat = res.flatten()
    assert flat[0][0] == "a" and len(flat) == 2

    # multi-query batching shape
    res2 = coll.query(query_vectors=[[1, 0, 0], [0, 1, 0]], n_results=1)
    assert res2.ids == [["a"], ["b"]], res2.ids

    # get / metadata round trip
    got = coll.get(["a", "missing", "b"])
    assert got["ids"] == ["a", "b"]
    assert got["vectors"][0] == [1.0, 0.0, 0.0]
    assert got["metadatas"][1] == {"lang": "de"}

    # upsert replaces in place
    coll.upsert(ids=["a"], vectors=[[0, 0, 1]],
                metadatas=[{"lang": "fr"}])
    assert coll.get(["a"])["vectors"][0] == [0.0, 0.0, 1.0]
    assert coll.count == 3

    # metadata-only query + keyset iteration
    page = coll.where({"lang": {"$eq": "en"}})
    assert [r["id"] for r in page["data"]] == ["c"]
    all_rows = sorted(vid for vid, _, _ in coll)
    assert all_rows == ["a", "b", "c"], all_rows

    # delete
    assert coll.delete(["c"]) == 1
    assert coll.count == 2

    # server-side errors surface as GraftError with the body's code
    try:
        client.create_collection("notes", dimensions=3)
        raise AssertionError("duplicate collection not rejected")
    except GraftError as e:
        assert e.status in (400, 409), e

    client.delete_collection("notes")
    assert client.list_collections() == []

    # agentic memory: remember / filtered recall / forget
    mem = client.memory("memories", dimensions=3)
    m1 = mem.remember("prefers dark mode", [1, 0, 0],
                      tier="semantic", importance=0.9)
    m2 = mem.remember("asked about spark", [0.9, 0.1, 0],
                      tier="episodic", importance=0.4, session_id="s1")
    mem.remember("low-value note", [0, 1, 0],
                 tier="episodic", importance=0.1)
    hits = mem.recall([1, 0, 0], k=5, tier="semantic")
    assert [h["memory_id"] for h in hits] == [m1], hits
    assert hits[0]["content"] == "prefers dark mode"
    assert hits[0]["importance"] == 0.9
    important = mem.recall([1, 0, 0], k=5, min_importance=0.3)
    assert [h["memory_id"] for h in important] == [m1, m2], important
    scoped = mem.recall([1, 0, 0], k=5, session_id="s1")
    assert [h["memory_id"] for h in scoped] == [m2], scoped
    assert mem.forget(m1) and not mem.forget(m1)
    assert mem.collection.count == 2
    client.delete_collection("memories")

print("graft_db smoke OK")
spark.stop()
