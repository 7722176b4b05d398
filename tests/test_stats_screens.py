"""Semantic cross-checks of the statistical screens
(contract/stats_queries.py) against independent float-domain
recomputations — the DuckDB oracle proves cross-engine equality, these
prove the integer-ppm formulations actually compute the statistics they
claim."""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.01"


def _daily(con, by_type: bool):
    key = "event_type, " if by_type else ""
    return con.execute(
        f"""
        SELECT {key}CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT),
               COUNT(*)
        FROM '{SF}/events.parquet' GROUP BY ALL ORDER BY ALL
        """
    ).fetchall()


def test_regression_slope_matches_numpy(spark):
    import numpy as np

    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = {
        r.event_type: r
        for r in QUERIES["stats_regression_daily_trend"](spark, SF).collect()
    }
    con = duckdb.connect()
    series: dict[str, list[tuple[float, float]]] = {}
    for et, x, y in _daily(con, by_type=True):
        series.setdefault(et, []).append((float(x), float(y)))
    for et, pts in series.items():
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        slope = np.polyfit(xs, ys, 1)[0]
        got = rows[et].slope_ppm / 1e6
        # floor-to-ppm quantization: within 1 ppm of the float slope
        assert abs(got - slope) <= 1e-6 + 1e-9 * abs(slope), (et, got, slope)


def test_benford_constants_and_chi2(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES
    from _event_intelligence_data_warehouse_spark.contract.stats_queries import (
        _BENFORD_PPM,
    )

    assert sum(_BENFORD_PPM.values()) == 1_000_000
    rows = QUERIES["stats_benford_screen"](spark, SF).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    n = sum(r.observed for r in rows)
    for r in rows:
        assert r.observed_ppm == r.observed * 1_000_000 // n
        d = r.observed_ppm - r.expected_ppm
        assert r.chi2_contrib_ppm == d * d // r.expected_ppm


def test_ab_z2_matches_float_formula(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = {
        r.variant: r for r in QUERIES["stats_ab_conversion"](spark, SF).collect()
    }
    assert set(rows) == {0, 1}
    n0, c0 = rows[0].users, rows[0].converters
    n1, c1 = rows[1].users, rows[1].converters
    assert 0 < c0 < n0 and 0 < c1 < n1, "conversion cut degenerate"
    p0, p1 = c0 / n0, c1 / n1
    pbar = (c0 + c1) / (n0 + n1)
    z2 = (p0 - p1) ** 2 / (pbar * (1 - pbar) * (1 / n0 + 1 / n1))
    got = rows[0].z2_milli / 1000
    assert rows[0].z2_milli == rows[1].z2_milli
    # ppm floor-divisions inside the pipeline: allow 2% relative slack
    assert abs(got - z2) <= 0.02 * max(z2, 1.0), (got, z2)


def test_autocorr_sign_and_magnitude_vs_numpy(spark):
    import numpy as np

    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = {
        r.lag_days: r
        for r in QUERIES["stats_autocorr_daily"](spark, SF).collect()
    }
    con = duckdb.connect()
    daily = _daily(con, by_type=False)
    ys = np.array([float(y) for _, y in daily])
    for lag, r in rows.items():
        a, b = ys[:-lag], ys[lag:]
        rho = np.corrcoef(a, b)[0, 1]
        got = r.r2_signed_ppm / 1e6
        want = (1 if rho >= 0 else -1) * rho * rho
        assert r.n_pairs == len(a)
        assert abs(got - want) <= 1e-5, (lag, got, want)


def test_ewma_fold_matches_python_recurrence(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = QUERIES["timeseries_ewma_daily"](spark, SF).collect()
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    for et, pts in series.items():
        pts.sort(key=lambda r: r.day_idx)
        s = None
        for r in pts:
            ppb = r.y * 1_000_000_000
            s = ppb if s is None else (ppb + 3 * s) // 4
            assert r.ewma_milli == s // 1_000_000, (et, r.day_idx)


def test_cusum_fold_matches_python_recurrence(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = sorted(
        QUERIES["timeseries_cusum_total"](spark, SF).collect(),
        key=lambda r: r.day_idx,
    )
    ys = [r.y for r in rows]
    mean_ppb = sum(ys) * 1_000_000_000 // len(ys)
    k = mean_ppb * 5 // 100
    hi = lo = 0
    for r in rows:
        ppb = r.y * 1_000_000_000
        hi = max(0, hi + ppb - mean_ppb - k)
        lo = max(0, lo + mean_ppb - ppb - k)
        assert r.cusum_hi_milli == hi // 1_000_000
        assert r.cusum_lo_milli == lo // 1_000_000
        assert r.drift_flag == int(hi > mean_ppb or lo > mean_ppb)


def test_group_variance_matches_numpy(spark):
    import numpy as np

    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = {
        r.o_orderpriority: r
        for r in QUERIES["stats_group_variance"](spark, SF).collect()
    }
    con = duckdb.connect()
    for pri, r in rows.items():
        vals = [
            v[0]
            for v in con.execute(
                f"""SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)
                   FROM '{SF}/orders.parquet'
                   WHERE o_orderpriority = ?""",
                [pri],
            ).fetchall()
        ]
        want = np.var(np.array(vals, dtype=np.float64), ddof=1)
        assert abs(r.var_cents2 - want) <= max(1.0, 1e-9 * want), pri


def test_share_of_parent_sums_to_one(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = QUERIES["olap_share_of_parent"](spark, SF).collect()
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    region_ppm = {}
    for reg, rs in by_region.items():
        s = sum(x.share_of_region_ppm for x in rs)
        # floor-div leakage only: within |nations-in-region| ppm
        assert 1_000_000 - len(rs) <= s <= 1_000_000
        region_ppm[reg] = rs[0].region_share_ppm
        assert len({x.region_share_ppm for x in rs}) == 1
    tot = sum(region_ppm.values())
    assert 1_000_000 - len(region_ppm) <= tot <= 1_000_000


def test_basket_lift_consistency(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = QUERIES["basket_part_pair_lift"](spark, SF).collect()
    assert 0 < len(rows) <= 100
    assert all(r.n12 >= 2 for r in rows)
    lifts = [r.lift_ppm for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_holt_fold_matches_python_recurrence(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = QUERIES["timeseries_holt_forecast"](spark, SF).collect()
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    for et, pts in series.items():
        pts.sort(key=lambda r: r.day_idx)
        l = b = None
        for r in pts:
            ppb = r.y * 1_000_000_000
            if l is None:
                l, b = ppb, 0
            else:
                new_l = tdiv(ppb + 3 * (l + b), 4)
                b = tdiv((new_l - l) + 7 * b, 8)
                l = new_l
            assert r.level_milli == tdiv(l, 1_000_000)
            assert r.trend_milli == tdiv(b, 1_000_000)
            assert r.forecast_milli == tdiv(l + b, 1_000_000)


def test_theil_sen_matches_brute_force_median(spark):
    """The integer micro-slope doubled-median equals a Python
    brute-force Theil-Sen (all pairwise slopes, statistics.median,
    doubled) computed on the same daily series with the same toward-zero
    truncation per pairwise slope."""
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = {
        r.event_type: r
        for r in QUERIES["stats_theil_sen_trend"](spark, SF).collect()
    }
    con = duckdb.connect()
    series: dict[str, list[tuple[int, int]]] = {}
    for et, x, y in _daily(con, by_type=True):
        series.setdefault(et, []).append((int(x), int(y)))
    assert rows
    for et, pts in series.items():
        slopes = []
        for a in range(len(pts)):
            for b in range(a + 1, len(pts)):
                dx = pts[b][0] - pts[a][0]
                dy = pts[b][1] - pts[a][1]
                q = abs(dy) * 1_000_000 // dx
                slopes.append(-q if dy < 0 else q)
        slopes.sort()
        n = len(slopes)
        doubled = slopes[(n + 1) // 2 - 1] + slopes[n // 2]
        assert rows[et].n_pairs == n
        assert rows[et].slope_micro_x2 == doubled, et


def test_changepoint_matches_brute_force_argmax(spark):
    """The integer scan statistic picks the same split as a Python
    brute-force over every t (same milli-floor statistic, earliest-t
    tiebreak), and the planted check: on a synthetic 40-day series with
    a level shift at day 25, split_t must be exactly 25."""
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = {
        r.event_type: r
        for r in QUERIES["stats_changepoint_daily"](spark, SF).collect()
    }
    con = duckdb.connect()
    series: dict[str, list[tuple[int, int]]] = {}
    for et, x, y in _daily(con, by_type=True):
        series.setdefault(et, []).append((int(x), int(y)))
    assert rows
    for et, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        n = len(ys)
        s = sum(ys)
        best = None
        p = 0
        for t in range(1, n):
            p += ys[t - 1]
            stat = ((n * p - t * s) ** 2 * 1000) // (t * (n - t))
            if best is None or stat > best[0]:
                best = (stat, t, pts[t - 1][0], p)
        stat, t, x, p = best
        r = rows[et]
        assert (r.split_t, r.split_day, r.stat_milli) == (t, x, stat), et
        assert r.mean_left_ppm == p * 1_000_000 // t
        assert r.mean_right_ppm == (s - p) * 1_000_000 // (n - t)

    # Planted shift: mean 10 for 25 days, mean 40 after.
    ys = [10] * 25 + [40] * 15
    n, s = len(ys), sum(ys)
    p, best = 0, None
    for t in range(1, n):
        p += ys[t - 1]
        stat = ((n * p - t * s) ** 2 * 1000) // (t * (n - t))
        if best is None or stat > best[0]:
            best = (stat, t)
    assert best[1] == 25


def test_hodges_lehmann_matches_scipy_convention(spark):
    """pseudo_median_x4 / 4 equals the brute-force median of Walsh
    averages (i <= j, including i = j) computed in Python on the same
    daily series."""
    import statistics

    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = {
        r.event_type: r
        for r in QUERIES["stats_hodges_lehmann"](spark, SF).collect()
    }
    con = duckdb.connect()
    series: dict[str, list[int]] = {}
    for et, _x, y in _daily(con, by_type=True):
        series.setdefault(et, []).append(int(y))
    assert rows
    for et, ys in series.items():
        walsh = [
            ys[a] + ys[b]
            for a in range(len(ys))
            for b in range(a, len(ys))
        ]
        walsh.sort()
        n = len(walsh)
        doubled = walsh[(n + 1) // 2 - 1] + walsh[n // 2]
        r = rows[et]
        assert r.n_walsh == n
        assert r.pseudo_median_x4 == doubled
        # sanity: the estimator sits at the statistics.median of the
        # float Walsh averages
        assert abs(doubled / 4 - statistics.median(w / 2 for w in walsh)) < 1e-9


def test_histogram_selectivity_accuracy_and_shape(spark):
    """Equi-depth histogram invariants on real data: exactly 32
    buckets, near-equal masses (no bucket above ~2x the ideal mass on
    this near-continuous column), and the range estimate lands within
    5% of the exact count (uniform intra-bucket interpolation is
    near-exact when values are dense)."""
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    r = QUERIES["stats_histogram_selectivity"](spark, SF).collect()[0]
    assert r.n_buckets == 32
    assert r.n_total > 0 and r.exact_rows > 0
    assert abs(r.est_rows - r.exact_rows) <= max(0.05 * r.exact_rows, 5)


def test_mann_kendall_matches_scipy_formula(spark):
    """S, the tie-corrected variance and the 5% decision match a
    brute-force Python recomputation (normal approximation with
    continuity correction, z > 1.96 two-sided) on the same series."""
    import math

    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = {
        r.event_type: r
        for r in QUERIES["stats_mann_kendall"](spark, SF).collect()
    }
    con = duckdb.connect()
    series: dict[str, list[tuple[int, int]]] = {}
    for et, x, y in _daily(con, by_type=True):
        series.setdefault(et, []).append((int(x), int(y)))
    assert rows
    for et, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        n = len(ys)
        s = sum(
            (ys[b] > ys[a]) - (ys[b] < ys[a])
            for a in range(n) for b in range(a + 1, n)
        )
        from collections import Counter
        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie
        r = rows[et]
        assert (r.s_stat, r.var_s_x18) == (s, var18), et
        if s == 0:
            exp = 0
        else:
            z = (abs(s) - 1) / math.sqrt(var18 / 18)
            exp = (1 if s > 0 else -1) if z > 1.96 else 0
        assert r.trend_direction == exp, (et, s, var18)


def test_kruskal_wallis_matches_scipy_convention(spark):
    """h_tie_corrected_ppm tracks scipy.stats.kruskal's H within the
    documented floor error (< k absolute on the ppm value), computed on
    the same per-type daily series."""
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    r = QUERIES["stats_kruskal_wallis"](spark, SF).collect()[0]
    con = duckdb.connect()
    series: dict[str, list[int]] = {}
    for et, _x, y in _daily(con, by_type=True):
        series.setdefault(et, []).append(int(y))
    # independent float recomputation (scipy formula, midranks)
    pooled = sorted(v for ys in series.values() for v in ys)
    n = len(pooled)
    # midrank per value
    import collections
    first = {}
    cnt = collections.Counter(pooled)
    run = 0
    rank = {}
    for v in sorted(cnt):
        rank[v] = (run + 1 + run + cnt[v]) / 2
        run += cnt[v]
    h = 12 / (n * (n + 1)) * sum(
        (sum(rank[v] for v in ys)) ** 2 / len(ys)
        for ys in series.values()
    ) - 3 * (n + 1)
    t = sum(c ** 3 - c for c in cnt.values())
    hc = h / (1 - t / (n ** 3 - n))
    assert r.n_groups == len(series) and r.n_total == n
    assert abs(r.h_tie_corrected_ppm / 1e6 - hc) < 1e-3
    crit = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.07}[r.df]
    assert r.significant_5pct == (hc > crit)


def _wilcoxon_events(spark, tmp_path, diffs):
    """Realize exact daily (view - click) count differences as a tiny
    events table: day k gets diff[k] extra 'view' rows (or extra
    'click' rows when negative), one baseline row of each type."""
    import datetime as dt

    rows = []
    eid = 0
    for day, diff in enumerate(diffs, start=1):
        nv = diff + 1 if diff > 0 else 1
        nc = 1 if diff > 0 else 1 - diff
        for etype, cnt in (("view", nv), ("click", nc)):
            for i in range(cnt):
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 1, day, i // 60, i % 60),
                        1,
                        etype,
                        1.0,
                        "{}",
                    )
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _wilcoxon_float(diffs):
    """Independent float-domain recomputation: doubled midranks over
    |diff|, normal approximation with tie correction, |z| > 1.96."""
    import collections
    import math

    ads = [abs(d) for d in diffs]
    cnt = collections.Counter(ads)
    run = 0
    rank2 = {}
    for v in sorted(cnt):
        rank2[v] = (run + 1) + (run + cnt[v])  # doubled midrank
        run += cnt[v]
    n = len(diffs)
    w2p = sum(rank2[abs(d)] for d in diffs if d > 0)
    t = sum(c**3 - c for c in cnt.values())
    var_w2p = (2 * n * (n + 1) * (2 * n + 1) - t) / 12.0
    z = (w2p - n * (n + 1) / 2.0) / math.sqrt(var_w2p)
    return w2p, abs(z) > 1.96


def test_wilcoxon_signed_rank_pinned_decisions(spark, tmp_path):
    """significant_5pct pinned against hand-computed cases (and the
    float z-formula) — guards the (2*W2+ - n(n+1))^2 * 3e4 centering;
    the previous mis-centered form rejected ~99% under H0 and missed
    an all-positive sample entirely."""
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    cases = [
        # (diffs, exp_w2p, exp_w2m, exp_mean2, exp_var12, exp_sig)
        # all-positive n=6, no ties: exact two-sided p = 2/64 < .05
        ([1, 2, 3, 4, 5, 6], 42, 0, 21, 1092, True),
        # mixed signs, z ~ 0.73: not significant
        ([1, -2, 3, 4, -5, 6], 28, 14, 21, 1092, False),
        # ties (T=12), z = 7/sqrt(29) ~ 1.30: not significant
        ([2, -2, 3, 3], 17, 3, 10, 348, False),
        # all-positive with ties (T=24), z ~ 2.53: significant
        ([1, 1, 2, 2, 3, 3, 4, 4], 72, 0, 36, 2424, True),
    ]
    for i, (diffs, w2p, w2m, mean2, var12, sig) in enumerate(cases):
        d = tmp_path / f"case{i}"
        d.mkdir()
        sf = _wilcoxon_events(spark, d, diffs)
        r = QUERIES["stats_wilcoxon_signed_rank"](spark, sf).collect()[0]
        assert r.n_pairs == len(diffs), (i, r)
        assert (r.w2_plus, r.w2_minus) == (w2p, w2m), (i, r)
        assert (r.mean2, r.var12) == (mean2, var12), (i, r)
        assert r.significant_5pct == sig, (i, r)
        fw2p, fsig = _wilcoxon_float(diffs)
        assert (fw2p, fsig) == (w2p, sig), (i, fw2p, fsig)


def test_wilcoxon_sf001_matches_float_formula(spark):
    """On the real sf0.01 series the integer decision equals the float
    z-test decision recomputed independently from DuckDB daily counts."""
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    con = duckdb.connect()
    daily: dict[int, dict[str, int]] = {}
    for et, x, y in _daily(con, by_type=True):
        if et in ("view", "click"):
            daily.setdefault(int(x), {})[et] = int(y)
    diffs = [
        v["view"] - v["click"]
        for v in daily.values()
        if "view" in v and "click" in v and v["view"] != v["click"]
    ]
    r = QUERIES["stats_wilcoxon_signed_rank"](
        spark, SF
    ).collect()[0]
    fw2p, fsig = _wilcoxon_float(diffs)
    assert r.n_pairs == len(diffs)
    assert r.w2_plus == fw2p
    assert r.significant_5pct == fsig
