"""2-D geometry / labels / cache evaluators — convexHull family,
enclosingDisk family, rank, set/get row-column labels, setValue, caches —
against pure-Python mirrors (``solr/solrj/src/java/org/apache/solr/client/
solrj/io/eval/{ConvexHull,EnclosingDisk,Rank,SetValue}Evaluator.java`` and
the Get*/Set* companions; the hull is commons MonotoneChain, the disk is
the minimal enclosing disk commons finds via WelzlEncloser)."""

import itertools
import math

import pytest

from lucene_solr_spark.evaluators import apply_let, parse_eval

POINTS = [
    [0.0, 0.0],
    [4.0, 0.5],
    [2.0, 3.0],
    [1.0, 1.0],
    [3.0, 2.5],
    [0.5, 2.0],
    [2.5, 0.2],
]
_MAT = "matrix(%s)" % ", ".join(
    "array(%s)" % ", ".join(map(str, r)) for r in POINTS
)


def _row(spark, let_text):
    return apply_let(spark.range(1), let_text).collect()[0]


# --------------------------------------------------------------------------
# mirrors


def _hull_py(points):
    pts = sorted(map(tuple, points))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and cross(h[-2], h[-1], p) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(list(reversed(pts)))
    return lower[:-1] + upper[:-1]


def _min_disk_py(points):
    pts = [tuple(p) for p in points]
    best = None
    for a, b in itertools.combinations(pts, 2):
        c = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
        r = math.dist(a, b) / 2
        if all(math.dist(c, p) <= r + 1e-10 for p in pts):
            if best is None or r < best[1]:
                best = (c, r)
    for a, b, c3 in itertools.combinations(pts, 3):
        d = 2 * (a[0] * (b[1] - c3[1]) + b[0] * (c3[1] - a[1]) + c3[0] * (a[1] - b[1]))
        if d == 0:
            continue
        ux = (
            (a[0] ** 2 + a[1] ** 2) * (b[1] - c3[1])
            + (b[0] ** 2 + b[1] ** 2) * (c3[1] - a[1])
            + (c3[0] ** 2 + c3[1] ** 2) * (a[1] - b[1])
        ) / d
        uy = (
            (a[0] ** 2 + a[1] ** 2) * (c3[0] - b[0])
            + (b[0] ** 2 + b[1] ** 2) * (a[0] - c3[0])
            + (c3[0] ** 2 + c3[1] ** 2) * (b[0] - a[0])
        ) / d
        r = math.dist((ux, uy), a)
        if all(math.dist((ux, uy), p) <= r + 1e-10 for p in pts):
            if best is None or r < best[1]:
                best = ((ux, uy), r)
    return best


# --------------------------------------------------------------------------


def test_convex_hull_vertices_and_measures(spark):
    row = _row(
        spark,
        f"let(h=convexHull({_MAT}), v=getVertices(h), a=getArea(h), "
        "b=getBoundarySize(h), c=getBaryCenter(h))",
    )
    hull = _hull_py(POINTS)
    assert [tuple(p) for p in row["v"]] == hull
    # shoelace area / perimeter / area centroid over the mirror ring
    n = len(hull)
    s2 = sum(
        hull[i][0] * hull[(i + 1) % n][1] - hull[(i + 1) % n][0] * hull[i][1]
        for i in range(n)
    )
    assert row["a"] == pytest.approx(s2 / 2, abs=1e-12)
    per = sum(math.dist(hull[i], hull[(i + 1) % n]) for i in range(n))
    assert row["b"] == pytest.approx(per, abs=1e-12)
    cx = sum(
        (hull[i][0] + hull[(i + 1) % n][0])
        * (hull[i][0] * hull[(i + 1) % n][1] - hull[(i + 1) % n][0] * hull[i][1])
        for i in range(n)
    ) / (3 * s2)
    cy = sum(
        (hull[i][1] + hull[(i + 1) % n][1])
        * (hull[i][0] * hull[(i + 1) % n][1] - hull[(i + 1) % n][0] * hull[i][1])
        for i in range(n)
    ) / (3 * s2)
    assert list(row["c"]) == pytest.approx([cx, cy], abs=1e-12)


def test_convex_hull_excludes_interior_and_collinear(spark):
    # square + midpoint-of-edge (collinear) + interior point
    pts = "matrix(array(0,0), array(2,0), array(2,2), array(0,2), array(1,0), array(1,1))"
    row = _row(spark, f"let(v=getVertices(convexHull({pts})))")
    assert [tuple(p) for p in row["v"]] == [(0, 0), (2, 0), (2, 2), (0, 2)]


def test_enclosing_disk(spark):
    row = _row(
        spark,
        f"let(d=enclosingDisk({_MAT}), c=getCenter(d), r=getRadius(d), "
        "s=getSupportPoints(d))",
    )
    (cx, cy), r = _min_disk_py(POINTS)
    assert row["r"] == pytest.approx(r, abs=1e-9)
    assert list(row["c"]) == pytest.approx([cx, cy], abs=1e-9)
    # every support point lies on the disk boundary
    for p in row["s"]:
        assert math.dist((row["c"][0], row["c"][1]), tuple(p)) == pytest.approx(
            row["r"], abs=1e-9
        )


def test_rank_natural_with_tie_average(spark):
    got = _row(spark, "let(r=rank(array(3, 1, 4, 1, 5, 9, 2, 6, 5, 3)))")["r"]
    # commons NaturalRanking(TiesStrategy.AVERAGE): ascending 1-based
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    expect = [
        sum(1 for w in vals if w < v) + (sum(1 for w in vals if w == v) + 1) / 2
        for v in vals
    ]
    assert list(got) == pytest.approx(expect)


def test_matrix_labels_roundtrip(spark):
    row = _row(
        spark,
        "let(m=setRowLabels(setColumnLabels(matrix(array(1, 2), array(3, 4)), "
        "array('c1', 'c2')), array('r1', 'r2')), "
        "rl=getRowLabels(m), cl=getColumnLabels(m), t=transpose(m))",
    )
    assert list(row["rl"]) == ["r1", "r2"]
    assert list(row["cl"]) == ["c1", "c2"]
    # a label-unaware consumer sees the plain matrix
    assert [list(r) for r in row["t"]] == [[1.0, 3.0], [2.0, 4.0]]


def test_set_value_and_caches(spark):
    row = _row(
        spark,
        "let(m=regress(array(1, 2, 3), array(2, 4, 6.5)), "
        "m2=setValue(m, 'note', 7.5), x=getValue(m2, 'note'), "
        "s=getValue(m2, 'slope'), "
        "p=putCache('sp', 'k1', array(1, 2, 3)), "
        "g=length(getCache('sp', 'k1')), l=listCache('sp'), "
        "r=length(removeCache('sp', 'k1')))",
    )
    assert row["x"] == 7.5
    assert row["s"] == pytest.approx(2.25)
    assert row["g"] == 3
    assert list(row["l"]) == ["k1"]
    assert row["r"] == 3
    with pytest.raises(ValueError):
        parse_eval("getCache('sp', 'k1')")  # removed above
