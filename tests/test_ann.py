"""Trained IVF ANN: deterministic k-means training, partition-prunable
bucket assignment, nprobe recall behaviour (exact at full probe)."""

import os

import numpy as np
import pytest

from lucene_solr_spark.ann import brute_force_topk, ivf_assign, ivf_search, ivf_train

SF_DIR = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
N_CENTROIDS = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


@pytest.fixture(scope="module")
def model(emb):
    cents = ivf_train(emb, n_centroids=N_CENTROIDS, iters=6, seed=13)
    assigned = ivf_assign(emb, cents).cache()
    return cents, assigned


def test_training_is_deterministic(emb):
    c1 = ivf_train(emb, n_centroids=N_CENTROIDS, iters=6, seed=13)
    c2 = ivf_train(emb, n_centroids=N_CENTROIDS, iters=6, seed=13)
    assert np.array_equal(c1, c2)
    assert c1.shape[0] == N_CENTROIDS
    # unit-norm centroids (spherical k-means)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_assignment_covers_and_balances(model, emb):
    cents, assigned = model
    counts = {r.bucket: r["count"] for r in assigned.groupBy("bucket").count().collect()}
    assert sum(counts.values()) == emb.count()
    assert all(0 <= b < N_CENTROIDS for b in counts)
    assert len(counts) >= N_CENTROIDS // 2  # no degenerate single-bucket model


def test_full_probe_equals_brute_force(model, emb):
    cents, assigned = model
    qvec = emb.filter("vec_id = 0").collect()[0].embedding
    exact = [r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()]
    full = [
        r.vec_id
        for r in ivf_search(assigned, cents, qvec, k=10, nprobe=N_CENTROIDS).collect()
    ]
    assert full == exact


def test_nprobe_recall(model, emb):
    """Probing half the buckets must recover most of the true top-10, and
    recall must be monotone-ish in nprobe."""
    cents, assigned = model
    recalls = {}
    for nprobe in (1, N_CENTROIDS // 2, N_CENTROIDS):
        hits = 0
        for qid in (0, 7, 23):
            qvec = emb.filter(f"vec_id = {qid}").collect()[0].embedding
            exact = {r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()}
            got = {
                r.vec_id
                for r in ivf_search(assigned, cents, qvec, k=10, nprobe=nprobe).collect()
            }
            hits += len(exact & got)
        recalls[nprobe] = hits / 30
    assert recalls[N_CENTROIDS] == 1.0
    assert recalls[N_CENTROIDS // 2] >= 0.6, recalls
    assert recalls[1] <= recalls[N_CENTROIDS // 2] + 1e-9


def test_probe_scan_is_bucket_pruned(model):
    """The candidate scan must carry the bucket IN-filter (partition-pruning
    hook at warehouse scale)."""
    cents, assigned = model
    import io
    from contextlib import redirect_stdout

    qvec = np.ones(len(cents[0]))
    df = ivf_search(assigned, cents, qvec, k=5, nprobe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "bucket" in buf.getvalue()
