"""Round-9 mechanism pins: the rank_cells packed-vs-window dual path
and the global_line_dedup literal-separator contract (r8 ADVICE)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _vectors(spark, n=40, dim=6):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def _centroids(spark, k=5, dim=6):
    rows = [
        (c, [float((c * 5 + j) % 7) - 3.0 for j in range(dim)])
        for c in range(k)
    ]
    return spark.createDataFrame(rows, "cell int, centroid array<double>")


def test_rank_cells_window_path_identical(spark):
    """The >RANK_CELLS_PACKED_MAX_CELLS fallback (crossJoin + window)
    must be value- AND order-identical to the packed projection,
    including cosine ties (duplicate centroids) resolved by cell ASC."""
    from _event_intelligence_data_warehouse_spark.operators import (
        similarity as sim,
    )

    v = _vectors(spark)
    # duplicate centroid 0 as cell 4 -> guaranteed cell_sim tie
    c = _centroids(spark, k=4)
    c = c.unionByName(
        c.filter(F.col("cell") == 0).select(
            F.lit(4).cast("int").alias("cell"), "centroid"
        )
    )
    packed = {
        (r.vec_id, r.cell_rank): (r.cell, r.cell_sim)
        for r in sim.rank_cells(v, c).collect()
    }
    windowed = {
        (r.vec_id, r.cell_rank): (r.cell, r.cell_sim)
        for r in sim._rank_cells_window(v, c).collect()
    }
    assert packed == windowed
    # tie actually exercised: for every vector, duplicate cells 0 and 4
    # have equal sims, with the tie broken cell-ASC (0 before 4)
    by_vec = {}
    for (vid, rk), (cell, s) in packed.items():
        by_vec.setdefault(vid, {})[cell] = (rk, s)
    for vid, cells in by_vec.items():
        r0, s0 = cells[0]
        r4, s4 = cells[4]
        assert s0 == s4 and r0 < r4, (vid, cells)


def test_rank_cells_cap_routes_to_window(spark, monkeypatch):
    """Above the packed cap rank_cells must route to the window
    formulation (no single-row model collect) and still agree."""
    from _event_intelligence_data_warehouse_spark.operators import (
        similarity as sim,
    )

    v = _vectors(spark, n=10)
    c = _centroids(spark, k=5)
    monkeypatch.setattr(sim, "RANK_CELLS_PACKED_MAX_CELLS", 3)
    routed = sim.rank_cells(v, c)
    assert "row_number" in routed._jdf.queryExecution().analyzed().toString()
    got = {(r.vec_id, r.cell_rank): r.cell for r in routed.collect()}
    monkeypatch.setattr(sim, "RANK_CELLS_PACKED_MAX_CELLS", 4096)
    want = {
        (r.vec_id, r.cell_rank): r.cell
        for r in sim.rank_cells(v, c).collect()
    }
    assert got == want


def test_global_line_dedup_literal_separator(spark):
    """sep is documented as a LITERAL: a regex-metacharacter separator
    ('.') must split on dots only, and the md5 reconstruction must
    match a hand rebuild of the surviving segments."""
    import hashlib

    from _event_intelligence_data_warehouse_spark.operators import (
        dedup as dd,
    )

    docs = spark.createDataFrame(
        [(1, "aa.bb.cc"), (2, "bb.dd")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dd.global_line_dedup(docs, sep=".").collect()
    }
    # doc 1 keeps all three segments; doc 2 loses 'bb' (first seen in
    # doc 1) and keeps 'dd'
    assert out[1].n_lines_kept == 3
    assert out[2].n_lines_kept == 1
    assert out[1].rebuilt_md5 == hashlib.md5(b"aa.bb.cc").hexdigest()
    assert out[2].rebuilt_md5 == hashlib.md5(b"dd").hexdigest()
