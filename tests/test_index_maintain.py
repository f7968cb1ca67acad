"""Index maintenance cadence (r10, VERDICT r9 #4): maintain() compacts
per-batch partition accretion in MinHashIndex and IvfIndex without
changing a single stored row, and the manifest transaction makes an
interrupted compaction heal instead of duplicating rows.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from ralf_spark.operators.dedup import MinHashIndex
from ralf_spark.operators.similarity import IvfIndex
from ralf_spark.table import FeatureTable


def _docs(spark, ids, text="the quick brown fox jumps over the lazy dog"):
    return FeatureTable(
        spark.createDataFrame(
            [(i, f"{text} {i % 3}") for i in ids], "doc_id long, text string"
        ),
        key="doc_id",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_index_maintain_preserves_rows_and_pairs(spark, tmp_path):
    path = str(tmp_path / "idx")
    twin = str(tmp_path / "twin")
    idx = MinHashIndex(path, num_perm=16, bands=8, hash_fn="xxhash64")
    ref = MinHashIndex(twin, num_perm=16, bands=8, hash_fn="xxhash64")
    idx.build(_docs(spark, range(0, 6)))
    ref.build(_docs(spark, range(0, 6)))
    for b in range(4):
        ids = range(6 + b * 4, 10 + b * 4)
        idx.add(_docs(spark, ids), threshold=0.3, batch_tag=f"b{b}")
        ref.add(_docs(spark, ids), threshold=0.3, batch_tag=f"b{b}")
    before_sigs = _rows(idx._read(spark, "sigs"))
    dirs_before = len(glob.glob(f"{path}/sigs/_batch=*"))
    assert dirs_before == 5  # build + 4 adds
    out = idx.maintain(spark)
    assert out["sigs"]["compacted_tags"] == 4  # keep_last=1 spares b3
    assert len(glob.glob(f"{path}/sigs/_batch=*")) == 2
    assert len(glob.glob(f"{path}/buckets/_batch=*")) == 2
    # stored rows identical, fresh handle
    idx2 = MinHashIndex(path, num_perm=16, bands=8, hash_fn="xxhash64")
    assert _rows(idx2._read(spark, "sigs")) == before_sigs
    # a post-maintenance add returns the same pairs as the uncompacted twin
    batch = _docs(spark, range(100, 104))
    got = _rows(idx2.add(batch, threshold=0.3, batch_tag="post"))
    want = _rows(ref.add(batch, threshold=0.3, batch_tag="post"))
    assert got == want and len(got) > 0
    # idempotent: nothing left to compact beyond keep_last
    again = idx2.maintain(spark)
    assert again["sigs"] is None or again["sigs"]["compacted_tags"] >= 2


def test_ivf_index_maintain_preserves_query_results(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(5)
    cen = [(c, [float(x) for x in rng.randn(4) * 3]) for c in range(8)]

    def vecs(ids):
        return FeatureTable(
            spark.createDataFrame(
                [(i, [float(x) for x in cen[i % 8][1] + 0.1 * rng.randn(4)])
                 for i in ids],
                "vec_id long, embedding array<double>",
            ),
            key="vec_id",
        )

    path = str(tmp_path / "ivf")
    idx = IvfIndex(path)
    idx.build(
        vecs(range(0, 40)),
        spark.createDataFrame(
            cen, "centroid_id long, centroid_vec array<double>"
        ),
    )
    for b in range(4):
        idx.add(vecs(range(40 + b * 10, 50 + b * 10)), batch_tag=f"b{b}")
    q = spark.createDataFrame(
        [(i, [float(x) for x in cen[i % 8][1]]) for i in range(5)],
        "query_id long, query_vec array<double>",
    )
    before = _rows(idx.query(q, k=5, nprobe=2))
    n_dirs = len(glob.glob(f"{path}/cells/cell=*/_batch=*"))
    out = idx.maintain(spark)
    assert out is not None and out["compacted_tags"] == 4
    assert len(glob.glob(f"{path}/cells/cell=*/_batch=*")) < n_dirs
    # every per-cell dir set is now {compacted, b3}
    tags = {
        os.path.basename(p).split("=", 1)[1]
        for p in glob.glob(f"{path}/cells/cell=*/_batch=*")
    }
    assert len(tags) == 2 and "b3" in tags
    idx2 = IvfIndex(path)
    assert _rows(idx2.query(q, k=5, nprobe=2)) == before
    # the sidecars survived
    assert os.path.exists(f"{path}/centroids")
    # and a post-maintenance add + query still accumulates
    idx2.add(vecs(range(200, 210)), batch_tag="post")
    after_add = idx2.query(q, k=5, nprobe=2)
    assert after_add.count() == 25


def test_compaction_manifest_recovery(spark, tmp_path):
    """Interrupted compactions heal: a not-done manifest rolls back the
    partial compacted partition; a done manifest finishes the source
    deletes. Row sets are exact either way."""
    import shutil

    from ralf_spark.connectors import write_json_sidecar
    from ralf_spark.layout import recover_compaction

    path = str(tmp_path / "idx")
    idx = MinHashIndex(path, num_perm=16, bands=8, hash_fn="xxhash64")
    idx.build(_docs(spark, range(0, 4)))
    idx.add(_docs(spark, range(4, 8)), batch_tag="b0")
    idx.add(_docs(spark, range(8, 12)), batch_tag="b1")
    root = f"{path}/sigs"
    want = _rows(idx._read(spark, "sigs"))

    # crash BEFORE done: partial compacted dir exists, sources intact
    shutil.copytree(f"{root}/_batch=b0", f"{root}/_batch=ctag1")
    write_json_sidecar(
        spark, f"{root}/.compact_manifest.json",
        {"ctag": "ctag1", "sources": ["__base__", "b0"], "done": False},
    )
    recover_compaction(spark, root)
    assert not os.path.exists(f"{root}/_batch=ctag1")
    assert os.path.exists(f"{root}/_batch=b0")
    assert not os.path.exists(f"{root}/.compact_manifest.json")
    assert _rows(idx._read(spark, "sigs")) == want

    # crash AFTER done: compacted dir holds the rows, a source remains
    shutil.copytree(f"{root}/_batch=b0", f"{root}/_batch=ctag2")
    write_json_sidecar(
        spark, f"{root}/.compact_manifest.json",
        {"ctag": "ctag2", "sources": ["b0"], "done": True},
    )
    recover_compaction(spark, root)
    assert os.path.exists(f"{root}/_batch=ctag2")
    assert not os.path.exists(f"{root}/_batch=b0")
    assert _rows(idx._read(spark, "sigs")) == want  # ctag2 replaced b0
