"""LatLonShape SHAPE-DOCUMENT indexing role (``LatLonShape.java:63`` —
tessellated triangles in a BKD tree; ``LatLonShapePolygonQuery.java``
INTERSECTS/WITHIN/DISJOINT): the cell posting table, the cell-pruned
scan, and relate-mode algebra. Value parity with DuckDB runs in
tests/test_entry.py (shape_index_join + the three shape_relate_* ops)."""

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_cell_index_covers_every_triangle(spark):
    from lucene_solr_spark.relational import _shapes_df, shape_cell_index

    n_shapes = _shapes_df(spark, SF).count()
    idx = shape_cell_index(spark, SF)
    assert idx.select("shape_id").distinct().count() == n_shapes
    # bbox expansion at 10-degree cells: a triangle spanning 11x9 degrees
    # covers between 1x1 and 3x2 cells
    per_shape = [r["n"] for r in idx.groupBy("shape_id").count()
                 .withColumnRenamed("count", "n").collect()]
    assert all(1 <= n <= 6 for n in per_shape)
    # (cell, shape_id) rows are unique — the join needs no distinct
    assert idx.count() == idx.select("cell", "shape_id").distinct().count()


def test_relate_scan_is_cell_pruned(spark):
    """The ShapeQuery.relate() split must reach the scan: candidates are
    selected by a cell IN-list, and OUTSIDE cells never leave the scan."""
    from lucene_solr_spark.relational import (
        _SHAPE_QUERY_POLY,
        _classify_cells,
        shape_relate,
    )

    plan = _plan(shape_relate(spark, SF, "intersects"))
    # the candidate-cell IN-list (Catalyst renders a large one as INSET)
    assert "INSET" in plan or "isin" in plan.lower() or " IN " in plan
    inside, boundary = _classify_cells(_SHAPE_QUERY_POLY)
    # the prune is real: the candidate cell list is a strict subset of the
    # global grid
    assert 0 < len(inside | boundary) < 18 * 36


def test_point_join_probes_one_cell(spark):
    """shape_index_join equi-joins on the cell id — the exact ray cast
    runs on cell-colocated pairs only, never all pairs (no cartesian in
    the plan)."""
    from lucene_solr_spark.relational import shape_index_join

    plan = _plan(shape_index_join(spark, SF))
    assert "Cartesian" not in plan
    assert "cell" in plan


def test_relate_mode_algebra(spark):
    from lucene_solr_spark.relational import _shapes_df, shape_relate

    inter = {r["shape_id"] for r in shape_relate(spark, SF, "intersects").collect()}
    within = {r["shape_id"] for r in shape_relate(spark, SF, "within").collect()}
    disjoint = {r["shape_id"] for r in shape_relate(spark, SF, "disjoint").collect()}
    allids = {r["shape_id"] for r in _shapes_df(spark, SF).select("shape_id").collect()}
    assert within <= inter
    assert inter | disjoint == allids
    assert inter & disjoint == set()
    assert within and inter - within  # both relate classes non-trivial


def test_unknown_relate_rejected(spark):
    import pytest

    from lucene_solr_spark.relational import shape_relate

    with pytest.raises(ValueError, match="unknown relate"):
        shape_relate(spark, SF, "touches")


def test_line_relate_algebra_and_prune(spark):
    """LINE shapes (LatLonShape Line role — each segment is the
    tessellation unit): same cell-pruned candidates, relate algebra holds.
    Value parity with DuckDB runs in tests/test_entry.py."""
    from lucene_solr_spark.relational import _lines_df, line_relate

    inter = {r["shape_id"] for r in line_relate(spark, SF, "intersects").collect()}
    within = {r["shape_id"] for r in line_relate(spark, SF, "within").collect()}
    disjoint = {r["shape_id"] for r in line_relate(spark, SF, "disjoint").collect()}
    allids = {r["shape_id"] for r in _lines_df(spark, SF).select("shape_id").collect()}
    assert within <= inter
    assert inter | disjoint == allids and inter & disjoint == set()
    plan = _plan(line_relate(spark, SF, "intersects"))
    assert "INSET" in plan or "isin" in plan.lower() or " IN " in plan
