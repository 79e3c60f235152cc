"""Tiny JSON artifact IO through the Hadoop FileSystem API.

Model-sized artifacts (IVF-PQ indexes, BPE merge tables) need to live
NEXT TO the data they describe — on whatever filesystem the lake uses.
Writing goes through ``FileSystem.create`` via py4j so the same call
works on file://, hdfs://, s3a://, ...; reading uses Spark's wholetext
reader (one tiny file, no driver-side FS client needed).

File names must not start with ``_`` or ``.``: Spark's input path
filter hides such files from readers (the ``_SUCCESS`` convention).
"""

from __future__ import annotations

import json
from typing import Any


def write_json_file(spark, path: str, payload: Any) -> None:
    """Serialize ``payload`` as JSON to a single file at ``path`` on
    any Hadoop-supported filesystem (overwrites)."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        stream.close()


def read_json_file(spark, path: str) -> Any:
    """Read one JSON file written by :func:`write_json_file` (or any
    single-file JSON document) from any Hadoop-supported filesystem."""
    rows = (
        spark.read.option("wholetext", "true").text(path).collect()
    )
    if not rows:
        raise ValueError(f"{path}: empty or unreadable JSON artifact")
    return json.loads(rows[0][0])
