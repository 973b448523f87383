

def test_polygon_grid_classification_is_sound():
    """ComponentTree.relate() soundness on the ingest grid: every point in
    an INSIDE cell is truly inside the polygon, every point outside the
    candidate set (INSIDE ∪ BOUNDARY) is truly outside — so skipping the
    exact test on INSIDE cells and dropping OUTSIDE cells at the scan can
    never change the result."""
    from lucene_solr_spark.relational import (
        _GRID_DEG,
        _N_LON_CELLS,
        _POLY_SET,
        _classify_cells,
        _pt_in_poly,
    )

    for poly in _POLY_SET:
        inside, boundary = _classify_cells(poly)
        assert inside or boundary  # every test polygon spans >=1 cell
        assert not (inside & boundary)
        # the synthetic driver-table lattice: lat/lon at integer + 0.5
        for lat in range(-90, 90):
            for lon in range(-180, 180):
                y, x = lat + 0.5, lon + 0.5
                cell = int((y + 90) // _GRID_DEG) * _N_LON_CELLS + int(
                    (x + 180) // _GRID_DEG
                )
                truth = _pt_in_poly(poly, y, x)
                if cell in inside:
                    assert truth, (poly, y, x)
                elif cell not in boundary:
                    assert not truth, (poly, y, x)
