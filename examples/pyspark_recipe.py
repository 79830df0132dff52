#!/usr/bin/env python3
"""PySpark recipe for the graft engine (the needle-python stand-in).

Data-pipeline users are Python-first; the engine is a Scala Spark library,
so Python drives it three ways, all shown below against the bundled
testdata:

  1. plain Spark SQL over the same parquet tables (no engine API at all);
  2. NeedleQL through the JVM gateway -- the full query language
     (NEAREST_TO, SIMILAR TO, HYBRID_SEARCH, RERANK BY, AS OF) with
     results coming back as ordinary PySpark DataFrames;
  3. the REST contract layer -- language-agnostic HTTP, byte-compatible
     with the reference server's request/response bodies.

Run with the library's compiled classes on the driver classpath:

  spark-submit --driver-class-path target/scala-2.13/classes \
      examples/pyspark_recipe.py /root/testdata/sf0.001

(or any PySpark session whose JVM can see the graft classes).
"""
import json
import sys
import urllib.request

from pyspark.sql import DataFrame, SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (SparkSession.builder
         .appName("graft-pyspark-recipe")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.artifact.isolation.enabled", "false")
         .getOrCreate())
jvm = spark._jvm  # the Py4J gateway into the engine


def jdf(java_df):
    """Wrap a JVM DataFrame returned by the engine as a PySpark DataFrame."""
    return DataFrame(java_df, spark)


# ---------------------------------------------------------------- 1. SQL
# The engine's tables are plain parquet: everything Spark SQL can say
# works unchanged, no engine API required.
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
emb.createOrReplaceTempView("embeddings")
print("== 1. Spark SQL ==")
spark.sql("""
    SELECT label, count(*) AS n FROM embeddings GROUP BY label ORDER BY label
""").show(5)

# ----------------------------------------------------- 2. NeedleQL session
# The full query language via the gateway. CollectionDef.of(...) is the
# Py4J-friendly constructor (no Scala default args across the bridge).
print("== 2. NeedleQL ==")
session = jvm.graft.needleql.NeedleSession(spark._jsparkSession)
session.register("docs", jvm.graft.needleql.CollectionDef.of(
    emb._jdf, "vec_id", "embedding", "cosine"))

# vector search: nearest 5 to a literal query vector
dims = len(emb.select("embedding").first()[0])
qvec = ", ".join(["0.1"] * dims)
hits = jdf(session.sql(
    f"SELECT vec_id, distance FROM docs NEAREST_TO([{qvec}], 'cosine', 5) "
    "LIMIT 5"))
hits.show()

# metadata filtering + the engine's filter JSON (MongoDB-style operators)
# through the same session: WHERE on a collection column
jdf(session.sql(
    "SELECT vec_id, label FROM docs WHERE label >= 5 LIMIT 3")).show()

# ------------------------------------------------------------- 3. REST
# The reference server's HTTP contract, hosted in-process: the purely
# Python-native path (any HTTP client; no JVM gateway needed once it
# is serving).
print("== 3. REST ==")
api = jvm.graft.server.RestApi(spark._jsparkSession)
server = api.serve(0)  # 0 = ephemeral port
port = server.getAddress().getPort()
base = f"http://127.0.0.1:{port}"


def call(method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(base + path, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


call("POST", "/collections", {"name": "notes", "dimensions": 3})
call("POST", "/collections/notes/vectors/batch", {"vectors": [
    {"id": "a", "vector": [1, 0, 0], "metadata": {"lang": "en"}},
    {"id": "b", "vector": [0, 1, 0], "metadata": {"lang": "de"}},
    {"id": "c", "vector": [0.9, 0.1, 0], "metadata": {"lang": "en"}},
]})
out = call("POST", "/collections/notes/search",
           {"vector": [1, 0, 0], "k": 2,
            "filter": {"lang": {"$eq": "en"}}})
print(json.dumps(out, indent=2))
assert [r["id"] for r in out["results"]] == ["a", "c"]
server.stop(0)

print("recipe OK")
spark.stop()
