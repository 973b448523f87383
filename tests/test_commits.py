"""Point-in-time commit opens — the ``DirectoryReader.open(IndexCommit)`` /
``listCommits`` analogue over the append-only manifest: segment ids are
monotone, so an id-prefix of the log IS a historical commit state. A searcher
opened at an old commit must match AND score exactly as a searcher did when
that commit was current (df/N statistics included)."""

import pytest


@pytest.fixture(scope="module")
def evolving_index(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import list_commits, next_segment_id

    corpus = synth_corpus_local(240)
    d = str(tmp_path_factory.mktemp("commits") / "idx")
    a = spark.createDataFrame(corpus.iloc[:120])
    build_index(spark, a, d, num_segments=2, analyzer="code")
    c1 = max(list_commits(spark, d))
    b = spark.createDataFrame(corpus.iloc[120:])
    build_index(
        spark, b, d, num_segments=2, analyzer="code",
        segment_base=next_segment_id(spark, d),
    )
    return d, c1


def _hits(searcher, q="parse OR buffer", k=15):
    return [
        (r.segment_id, r.doc_id, float(r.score))
        for r in searcher.search(q, k=k).orderBy("rank").collect()
    ]


def test_list_commits_monotone(spark, evolving_index):
    from lucene_solr_spark.index.manifest import list_commits

    d, c1 = evolving_index
    commits = list_commits(spark, d)
    assert commits == sorted(commits)
    assert c1 in commits and max(commits) > c1


def test_commit_open_sees_only_old_segments(spark, evolving_index):
    from lucene_solr_spark.search import IndexSearcher

    d, c1 = evolving_index
    old = IndexSearcher(spark, d, analyzer="code", commit=c1)
    now = IndexSearcher(spark, d, analyzer="code")
    assert set(old.live) < set(now.live)
    assert max(old.live) <= c1
    assert old.doc_count == 120 and now.doc_count == 240


def test_commit_open_is_score_exact(spark, evolving_index, tmp_path_factory):
    """Scores at commit C equal a searcher built over ONLY commit-C docs in
    a fresh directory — df/N statistics resolve as of the commit, not from
    the latest term_stats generation."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    d, c1 = evolving_index
    old = IndexSearcher(spark, d, analyzer="code", commit=c1)
    # independent ground truth: the same first-120 docs in their own index
    ref_dir = str(tmp_path_factory.mktemp("commits_ref") / "idx")
    corpus = synth_corpus_local(240)
    build_index(
        spark, spark.createDataFrame(corpus.iloc[:120]), ref_dir,
        num_segments=2, analyzer="code",
    )
    ref = IndexSearcher(spark, ref_dir, analyzer="code")
    assert _hits(old) == _hits(ref)
    # and differs from the current commit (df/N moved)
    now = IndexSearcher(spark, d, analyzer="code")
    assert _hits(old) != _hits(now)


def test_commit_survives_merge(spark, evolving_index):
    """After a merge consumes the old segments, the old commit still
    resolves to the ORIGINAL segment set (merge rows land later in the
    log), and matching is unchanged."""
    from lucene_solr_spark.index.merge import run_merges
    from lucene_solr_spark.search import IndexSearcher

    d, c1 = evolving_index
    before = _hits(IndexSearcher(spark, d, analyzer="code", commit=c1))
    run_merges(spark, d, segs_per_tier=1, max_merge_at_once=10)
    old = IndexSearcher(spark, d, analyzer="code", commit=c1)
    assert max(old.live) <= c1
    assert _hits(old) == before


def test_commit_open_expands_multiterm_against_old_dictionary(
    spark, evolving_index, tmp_path_factory
):
    """PrefixQuery expansion at an old commit must use that commit's term
    dictionary (df-ranked rewrites), matching a fresh index over only the
    old docs."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    d, c1 = evolving_index
    old = IndexSearcher(spark, d, analyzer="code", commit=c1)
    ref_dir = str(tmp_path_factory.mktemp("commits_mt") / "idx")
    corpus = synth_corpus_local(240)
    build_index(
        spark, spark.createDataFrame(corpus.iloc[:120]), ref_dir,
        num_segments=2, analyzer="code",
    )
    ref = IndexSearcher(spark, ref_dir, analyzer="code")
    got = _hits(old, q="pa*", k=12)
    want = _hits(ref, q="pa*", k=12)
    assert got == want


def test_soft_deletes_are_commit_versioned(spark, tmp_path_factory):
    """Per-commit liveDocs (SoftDeletesRetentionMergePolicy role): a doc
    deleted after commit N is still returned by IndexSearcher(commit=N);
    the live view and later commits exclude it."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import list_commits, next_segment_id
    from lucene_solr_spark.index.merge import delete_docs
    from lucene_solr_spark.search import IndexSearcher

    corpus = synth_corpus_local(160)
    d = str(tmp_path_factory.mktemp("softdel") / "idx")
    build_index(
        spark, spark.createDataFrame(corpus.iloc[:80]), d,
        num_segments=2, analyzer="code",
    )
    c1 = max(list_commits(spark, d))
    before = IndexSearcher(spark, d, analyzer="code", commit=c1)
    hits_before = _hits(before)
    assert hits_before, "need at least one match to delete"

    # delete the top hit AFTER commit c1, then land another segment so a
    # later commit exists
    seg, doc, _ = hits_before[0]
    delete_docs(
        spark, d, spark.createDataFrame([(seg, doc)], "segment_id int, doc_id long")
    )
    build_index(
        spark, spark.createDataFrame(corpus.iloc[80:]), d,
        num_segments=2, analyzer="code",
        segment_base=next_segment_id(spark, d),
    )
    c2 = max(list_commits(spark, d))

    # commit c1 predates the delete: identical hits, deleted doc included
    at_c1 = IndexSearcher(spark, d, analyzer="code", commit=c1)
    assert _hits(at_c1) == hits_before

    # the live view and commit c2 both exclude it
    live_hits = _hits(IndexSearcher(spark, d, analyzer="code"))
    at_c2_hits = _hits(IndexSearcher(spark, d, analyzer="code", commit=c2))
    assert (seg, doc) not in [(s, dd) for s, dd, _ in live_hits]
    assert (seg, doc) not in [(s, dd) for s, dd, _ in at_c2_hits]


def test_numeric_docvalue_updates(spark, tmp_path_factory):
    """IndexWriter.updateNumericDocValue role: sidecar generations patch the
    base column without touching segments; newest gen wins; a time-traveled
    reader at a commit before the update sees the original values."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.docvalues import (
        numeric_docvalues,
        update_numeric_docvalue,
    )
    from lucene_solr_spark.index.manifest import list_commits, next_segment_id

    corpus = synth_corpus_local(120)
    d = str(tmp_path_factory.mktemp("dvup") / "idx")
    build_index(
        spark, spark.createDataFrame(corpus.iloc[:60]), d,
        num_segments=2, analyzer="code",
    )
    c1 = max(list_commits(spark, d))

    docs = spark.read.parquet(d + "/docs").select("segment_id", "doc_id", "repo", "path")
    keys = [
        (r.repo, r.path)
        for r in docs.orderBy("segment_id", "doc_id").limit(3).collect()
    ]

    base = {
        (r.segment_id, r.doc_id): r.value
        for r in numeric_docvalues(spark, d, "rank_boost").collect()
    }
    assert base and all(v is None for v in base.values())  # no base column bound

    # gen 0: set three docs to 7
    update_numeric_docvalue(
        spark, d, "rank_boost",
        spark.createDataFrame(
            [(r, p, 7) for r, p in keys], "repo string, path string, value long"
        ),
        key_cols=["repo", "path"],
    )
    # land a later segment so a post-update commit exists
    build_index(
        spark, spark.createDataFrame(corpus.iloc[60:]), d,
        num_segments=2, analyzer="code", segment_base=next_segment_id(spark, d),
    )
    # gen 1: overwrite ONE of them to 9 — newest generation must win
    update_numeric_docvalue(
        spark, d, "rank_boost",
        spark.createDataFrame(
            [(keys[0][0], keys[0][1], 9)], "repo string, path string, value long"
        ),
        key_cols=["repo", "path"],
    )

    patched = numeric_docvalues(spark, d, "rank_boost")
    got = {
        (r.repo, r.path): r.value
        for r in patched.join(docs, ["segment_id", "doc_id"]).collect()
        if r.value is not None
    }
    assert got == {keys[0]: 9, keys[1]: 7, keys[2]: 7}

    # time-travel: commit c1 predates BOTH updates (watermark == c1 is not
    # < c1) — all values revert to base
    at_c1 = numeric_docvalues(spark, d, "rank_boost", commit=c1)
    assert all(r.value is None for r in at_c1.collect())

    # base-column binding: unpatched docs resolve to the docs-table column
    with_base = numeric_docvalues(spark, d, "rank_boost", base_col="doc_id")
    rows = {(r.segment_id, r.doc_id): r.value for r in with_base.collect()}
    n_patched = sum(1 for (s, dd), v in rows.items() if v != dd)
    assert n_patched == 3


def test_numeric_docvalues_exclude_merged_away_segments(spark, tmp_path_factory):
    """docs/ is append-only: after a compacting merge the DV view must
    resolve against the LIVE set only — no duplicate logical docs."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.docvalues import numeric_docvalues
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments

    corpus = synth_corpus_local(100)
    d = str(tmp_path_factory.mktemp("dvmrg") / "idx")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=4,
                analyzer="code")
    merge_segments(spark, d, live_segments(spark, d))
    view = numeric_docvalues(spark, d, "rank_boost")
    assert view.count() == 100  # one row per logical doc, not per docs/ row
    assert view.select("segment_id").distinct().count() == 1


def test_binary_docvalue_updates(spark, tmp_path_factory):
    """IndexWriter.updateBinaryDocValue role (IndexWriter.java:1742): the
    same dvGen sidecar protocol as numeric, value type binary — newest gen
    wins, time-travel reverts, base-column binding works."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.docvalues import (
        binary_docvalues,
        update_binary_docvalue,
    )
    from lucene_solr_spark.index.manifest import list_commits, next_segment_id

    corpus = synth_corpus_local(100)
    d = str(tmp_path_factory.mktemp("dvbin") / "idx")
    build_index(
        spark, spark.createDataFrame(corpus.iloc[:50]), d,
        num_segments=2, analyzer="code",
    )
    c1 = max(list_commits(spark, d))
    docs = spark.read.parquet(d + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    keys = [
        (r.repo, r.path)
        for r in docs.orderBy("segment_id", "doc_id").limit(3).collect()
    ]

    update_binary_docvalue(
        spark, d, "thumb",
        spark.createDataFrame(
            [(r, p, bytearray(b"v1")) for r, p in keys],
            "repo string, path string, value binary",
        ),
        key_cols=["repo", "path"],
    )
    build_index(
        spark, spark.createDataFrame(corpus.iloc[50:]), d,
        num_segments=2, analyzer="code", segment_base=next_segment_id(spark, d),
    )
    update_binary_docvalue(
        spark, d, "thumb",
        spark.createDataFrame(
            [(keys[0][0], keys[0][1], bytearray(b"v2"))],
            "repo string, path string, value binary",
        ),
        key_cols=["repo", "path"],
    )

    got = {
        (r.repo, r.path): bytes(r.value)
        for r in binary_docvalues(spark, d, "thumb")
        .join(docs, ["segment_id", "doc_id"]).collect()
        if r.value is not None
    }
    assert got == {keys[0]: b"v2", keys[1]: b"v1", keys[2]: b"v1"}

    # time-travel: c1 predates both generations
    at_c1 = binary_docvalues(spark, d, "thumb", commit=c1)
    assert all(r.value is None for r in at_c1.collect())

    # base-column binding: unpatched docs resolve to the docs column (path
    # cast to binary), patched docs override it
    with_base = binary_docvalues(spark, d, "thumb", base_col="path")
    joined = {
        (r.repo, r.path): bytes(r.value)
        for r in with_base.join(docs, ["segment_id", "doc_id"]).collect()
    }
    n_override = sum(1 for (rp, p), v in joined.items() if v != p.encode())
    assert n_override == 3


def test_sortedset_docvalue_updates(spark, tmp_path_factory):
    """Sorted-set sidecar updates (engine extension — the reference updates
    only numeric/binary DVs, IndexWriter.updateDocValues javadoc): values
    are stored sorted+deduped (SortedSetDocValues ordinal-order role);
    duplicate keys in one batch resolve to the UNION of their sets."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.docvalues import (
        sortedset_docvalues,
        update_sortedset_docvalue,
    )
    from lucene_solr_spark.index.manifest import list_commits

    corpus = synth_corpus_local(60)
    d = str(tmp_path_factory.mktemp("dvss") / "idx")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=2,
                analyzer="code")
    c1 = max(list_commits(spark, d))
    docs = spark.read.parquet(d + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    k0, k1 = [
        (r.repo, r.path)
        for r in docs.orderBy("segment_id", "doc_id").limit(2).collect()
    ]

    # duplicate key in one batch -> union; values come back sorted+deduped
    update_sortedset_docvalue(
        spark, d, "labels",
        spark.createDataFrame(
            [
                (k0[0], k0[1], ["zeta", "alpha", "alpha"]),
                (k0[0], k0[1], ["mid"]),
                (k1[0], k1[1], ["only"]),
            ],
            "repo string, path string, value array<string>",
        ),
        key_cols=["repo", "path"],
    )
    got = {
        (r.repo, r.path): r.value
        for r in sortedset_docvalues(spark, d, "labels")
        .join(docs, ["segment_id", "doc_id"]).collect()
        if r.value is not None
    }
    assert got == {k0: ["alpha", "mid", "zeta"], k1: ["only"]}

    # newest generation REPLACES the set (not merges) — gen semantics match
    # numeric/binary
    update_sortedset_docvalue(
        spark, d, "labels",
        spark.createDataFrame(
            [(k0[0], k0[1], ["replaced"])],
            "repo string, path string, value array<string>",
        ),
        key_cols=["repo", "path"],
    )
    got2 = {
        (r.repo, r.path): r.value
        for r in sortedset_docvalues(spark, d, "labels")
        .join(docs, ["segment_id", "doc_id"]).collect()
        if r.value is not None
    }
    assert got2 == {k0: ["replaced"], k1: ["only"]}

    # time-travel to before any update
    at_c1 = sortedset_docvalues(spark, d, "labels", commit=c1)
    assert all(r.value is None for r in at_c1.collect())


def test_docvalue_type_marker_rejects_mixed_types(spark, tmp_path_factory):
    """One DV type per field (Lucene: updating a field with the wrong DV
    type throws IllegalArgumentException) — the sidecar root records the
    type at first publish and later publishes of another type raise."""
    import pytest

    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.docvalues import (
        update_binary_docvalue,
        update_numeric_docvalue,
    )

    corpus = synth_corpus_local(30)
    d = str(tmp_path_factory.mktemp("dvmix") / "idx")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=1,
                analyzer="code")
    r0 = spark.read.parquet(d + "/docs").select("repo", "path").first()
    update_numeric_docvalue(
        spark, d, "f",
        spark.createDataFrame([(r0.repo, r0.path, 1)],
                              "repo string, path string, value long"),
        key_cols=["repo", "path"],
    )
    with pytest.raises(ValueError, match="[Dd][Vv] type"):
        update_binary_docvalue(
            spark, d, "f",
            spark.createDataFrame([(r0.repo, r0.path, bytearray(b"x"))],
                                  "repo string, path string, value binary"),
            key_cols=["repo", "path"],
        )


def test_dv_updates_survive_merge(spark, tmp_path_factory):
    """ReadersAndUpdates.writeFieldUpdates role (ReadersAndUpdates.java:510):
    a compacting merge folds each source segment's newest DV generation into
    one generation addressed at the merged segment, remapped through the
    merge docmap. Patched reads are identical before and after the merge;
    a tombstoned doc's pending update is dropped with it; time travel on
    both sides of the merge commit stays exact; all three DV types."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.docvalues import (
        binary_docvalues,
        numeric_docvalues,
        sortedset_docvalues,
        update_binary_docvalue,
        update_numeric_docvalue,
        update_sortedset_docvalue,
    )
    from lucene_solr_spark.index.manifest import list_commits, live_segments
    from lucene_solr_spark.index.merge import delete_docs, merge_segments

    corpus = synth_corpus_local(120)
    d = str(tmp_path_factory.mktemp("dvfold") / "idx")
    build_index(spark, spark.createDataFrame(corpus.iloc[:100]), d,
                num_segments=4, analyzer="code")
    c1 = max(list_commits(spark, d))

    docs = spark.read.parquet(d + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    keyrows = docs.orderBy("segment_id", "doc_id").limit(4).collect()
    keys = [(r.repo, r.path) for r in keyrows]

    update_numeric_docvalue(
        spark, d, "rank_boost",
        spark.createDataFrame(
            [(r, p, 7) for r, p in keys[:3]], "repo string, path string, value long"
        ),
        key_cols=["repo", "path"],
    )
    # a second numeric generation: the fold must pick the NEWEST gen
    update_numeric_docvalue(
        spark, d, "rank_boost",
        spark.createDataFrame(
            [(keys[0][0], keys[0][1], 9)], "repo string, path string, value long"
        ),
        key_cols=["repo", "path"],
    )
    update_binary_docvalue(
        spark, d, "thumb",
        spark.createDataFrame(
            [(r, p, bytearray(b"img-" + p.encode())) for r, p in keys[1:3]],
            "repo string, path string, value binary",
        ),
        key_cols=["repo", "path"],
    )
    update_sortedset_docvalue(
        spark, d, "labels",
        spark.createDataFrame(
            [(r, p, ["b", "a", "b"]) for r, p in keys[2:4]],
            "repo string, path string, value array<string>",
        ),
        key_cols=["repo", "path"],
    )

    # land a later segment: an update is visible only at commits strictly
    # after its watermark, so a pre-merge commit must exist that postdates
    # the updates for the time-travel check below
    from lucene_solr_spark.index.manifest import next_segment_id

    build_index(
        spark, spark.createDataFrame(corpus.iloc[100:]), d, num_segments=1,
        analyzer="code", segment_base=next_segment_id(spark, d),
    )

    def snap(view_fn, field):
        view = view_fn(spark, d, field)
        return {
            (r.repo, r.path): r.value
            for r in view.join(
                spark.read.parquet(d + "/docs").select(
                    "segment_id", "doc_id", "repo", "path"
                ),
                ["segment_id", "doc_id"],
            ).collect()
            if r.value is not None
        }

    pre_num = snap(numeric_docvalues, "rank_boost")
    pre_bin = snap(binary_docvalues, "thumb")
    pre_set = snap(sortedset_docvalues, "labels")
    assert pre_num == {keys[0]: 9, keys[1]: 7, keys[2]: 7}
    assert set(pre_set) == {keys[2], keys[3]}
    assert list(pre_set[keys[2]]) == ["a", "b"]

    # tombstone keys[3] (has a pending sorted-set update) — the merge must
    # drop its update along with the doc
    victim = keyrows[3]
    delete_docs(
        spark, d,
        spark.createDataFrame(
            [(victim.segment_id, victim.doc_id)], "segment_id int, doc_id bigint"
        ),
    )
    c_pre = max(list_commits(spark, d))

    merge_segments(spark, d, live_segments(spark, d))

    post_num = snap(numeric_docvalues, "rank_boost")
    post_bin = snap(binary_docvalues, "thumb")
    post_set = snap(sortedset_docvalues, "labels")
    assert post_num == pre_num
    assert post_bin == pre_bin
    assert post_set == {keys[2]: pre_set[keys[2]]}  # victim's update dropped

    # merged segment is the only live one — folded rows address it
    assert {s for s in live_segments(spark, d)} == {
        r.segment_id
        for r in numeric_docvalues(spark, d, "rank_boost")
        .select("segment_id").distinct().collect()
    }

    # time travel BEFORE the merge: source-addressed generations resolve
    at_pre = {
        (r.repo, r.path): r.value
        for r in numeric_docvalues(spark, d, "rank_boost", commit=c_pre)
        .join(docs, ["segment_id", "doc_id"]).collect()
        if r.value is not None
    }
    assert at_pre == pre_num
    # time travel to BEFORE any update: all base (None)
    assert all(
        r.value is None
        for r in numeric_docvalues(spark, d, "rank_boost", commit=c1).collect()
    )

    # a post-merge update supersedes the folded generation
    update_numeric_docvalue(
        spark, d, "rank_boost",
        spark.createDataFrame(
            [(keys[1][0], keys[1][1], 42)], "repo string, path string, value long"
        ),
        key_cols=["repo", "path"],
    )
    post2 = snap(numeric_docvalues, "rank_boost")
    assert post2[keys[1]] == 42 and post2[keys[0]] == 9


def test_dv_updates_survive_sorted_merge(spark, tmp_path_factory):
    """The sorted-merge path folds through its interleaving docmap too."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.docvalues import (
        numeric_docvalues,
        update_numeric_docvalue,
    )
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments

    corpus = synth_corpus_local(80)
    rows = [
        (r.repo, r.path, r.commit, r.content, float((i * 37) % 100) + 0.5)
        for i, r in enumerate(corpus.itertuples())
    ]
    docs_in = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, content string, price double",
    )
    d = str(tmp_path_factory.mktemp("dvfolds") / "idx")
    build_index(spark, docs_in, d, num_segments=3,
                analyzer="code", index_sort="price")
    docs = spark.read.parquet(d + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    keys = [
        (r.repo, r.path)
        for r in docs.orderBy("segment_id", "doc_id").limit(3).collect()
    ]
    update_numeric_docvalue(
        spark, d, "rank_boost",
        spark.createDataFrame(
            [(r, p, 5) for r, p in keys], "repo string, path string, value long"
        ),
        key_cols=["repo", "path"],
    )
    pre = {
        (r.repo, r.path): r.value
        for r in numeric_docvalues(spark, d, "rank_boost")
        .join(docs, ["segment_id", "doc_id"]).collect()
        if r.value is not None
    }
    assert pre == {k: 5 for k in keys}
    merge_segments(spark, d, live_segments(spark, d))
    post = {
        (r.repo, r.path): r.value
        for r in numeric_docvalues(spark, d, "rank_boost")
        .join(
            spark.read.parquet(d + "/docs").select(
                "segment_id", "doc_id", "repo", "path"
            ),
            ["segment_id", "doc_id"],
        ).collect()
        if r.value is not None
    }
    assert post == pre


def test_dv_fold_crash_before_manifest_commit_is_invisible(spark, tmp_path_factory):
    """Crash-safety of the fold-before-commit order: a folded generation
    addressed at a segment whose manifest row never landed must be
    invisible to every reader (live and time-traveled) — the retry simply
    re-publishes."""
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.docvalues import (
        fold_dv_updates,
        numeric_docvalues,
        update_numeric_docvalue,
    )
    from lucene_solr_spark.index.manifest import next_segment_id

    corpus = synth_corpus_local(60)
    d = str(tmp_path_factory.mktemp("dvcrash") / "idx")
    build_index(spark, spark.createDataFrame(corpus), d, num_segments=2,
                analyzer="code")
    docs = spark.read.parquet(d + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    from pyspark.sql import functions as F

    keys = [(r.repo, r.path) for r in docs.orderBy("segment_id", "doc_id").limit(2).collect()]
    update_numeric_docvalue(
        spark, d, "rank_boost",
        spark.createDataFrame(
            [(r, p, 3) for r, p in keys], "repo string, path string, value long"
        ),
        key_cols=["repo", "path"],
    )
    before = sorted(
        (r.segment_id, r.doc_id, r.value)
        for r in numeric_docvalues(spark, d, "rank_boost").collect()
        if r.value is not None
    )
    # simulate the crash window: the fold publishes against a segment id
    # that never commits (identity docmap over the live docs)
    phantom = next_segment_id(spark, d)
    docmap = docs.select(
        "segment_id", "doc_id", F.col("doc_id").alias("new_doc_id")
    )
    published = fold_dv_updates(spark, d, [0, 1], phantom, docmap)
    assert published  # a generation landed on disk...
    after = sorted(
        (r.segment_id, r.doc_id, r.value)
        for r in numeric_docvalues(spark, d, "rank_boost").collect()
        if r.value is not None
    )
    assert after == before  # ...but no reader can see it
