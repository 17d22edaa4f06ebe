"""The IVF index as a STORAGE LAYOUT: corpus partitioned by k-means list,
query scans only the probed lists (physical partition pruning), and the
pruned result matches the in-memory IVF query over the same quantizer."""

from __future__ import annotations

import pytest

from streamsum_spark.operators import similarity as sim
from streamsum_spark.plans import inspect as plans
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def ivf_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ivf") / "embeddings_ivf")
    sim.write_embeddings_ivf(spark, SF_ORACLE, out)
    return out


def test_partitioned_scan_prunes_lists(spark, ivf_path):
    df = sim.ann_ivf_partitioned_topk(spark, ivf_path, SF_ORACLE, nprobe=2)
    plan = plans.explain_str(df)
    scan = plan[plan.find("PartitionFilters") :].split("]", 1)[0]
    assert "list_id" in scan, plan  # pruning happens at the scan, pre-read


def test_partitioned_result_matches_in_memory_ivf(spark, ivf_path):
    """Same quantizer (seed-pinned k-means), same nprobe => identical
    top-k whether the lists are physical partitions or an in-memory
    join."""
    on_disk = [
        (r.vec_id, r.cos)
        for r in sim.ann_ivf_partitioned_topk(spark, ivf_path, SF_ORACLE, nprobe=2).collect()
    ]
    in_mem = [
        (r.vec_id, r.cos)
        for r in sim.ann_ivf_kmeans_topk(spark, SF_ORACLE, nprobe=2).collect()
    ]
    assert on_disk == in_mem


def test_quantized_layout_smaller_and_recall_holds(spark, tmp_path_factory, ivf_path):
    """The int8 layout is materially smaller on disk than the float32
    one, the same pruned query runs over it unchanged, and its top-10
    keeps >= 0.8 overlap with the float layout's (quantization error
    budget)."""
    import os

    qout = str(tmp_path_factory.mktemp("ivfq") / "embeddings_ivf")
    sim.write_embeddings_ivf(spark, SF_ORACLE, qout, quantize=True)

    def du(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )

    assert du(qout) < 0.6 * du(ivf_path), (du(qout), du(ivf_path))
    fl = [r.vec_id for r in sim.ann_ivf_partitioned_topk(spark, ivf_path, SF_ORACLE, k=10).collect()]
    qz = [r.vec_id for r in sim.ann_ivf_partitioned_topk(spark, qout, SF_ORACLE, k=10).collect()]
    assert len(set(fl) & set(qz)) >= 8, (fl, qz)


def test_layout_covers_whole_corpus(spark, ivf_path):
    from streamsum_spark.tables import table

    n_src = table(spark, SF_ORACLE, "embeddings").count()
    n_out = spark.read.parquet(ivf_path).count()
    assert n_out == n_src
