"""D4 — ADF stationarity with statsmodels-parity lag selection
(reference: distribution_evaluator.py:49-54 calls
``adfuller(x, maxlag=20, autolag="AIC")``).

Procedure (faithful to statsmodels.tsa.stattools.adfuller, regression
"c"):

1. Selection pass — on the maxlag-trimmed sample (rows where all 20
   Δy lags exist), fit the nested models p = 0..20 with regressors
   [const, y_{t-1}, Δy_{t-1}..Δy_{t-p}] and pick the p minimizing
   AIC ∝ n·ln(RSS_p/n) + 2·(p+2) (first minimum on ties, like
   ``min`` over (aic, lag) tuples).
2. Refit pass — re-estimate the chosen model on the longer sample that
   only needs p lags; the ADF statistic is the t-value of y_{t-1}.

Scale shape: the data never leaves the cluster. One aggregation pass
computes, per series and per candidate p, the Gram sums X'X / X'y /
y'y (filtered sum-of-product columns — map-side combined, one shuffle
of one row per series). The per-series solve is O(maxlag⁴) driver
arithmetic on those sums.

Numerical method (identical in both engines): bordered right-looking
LDL elimination. The Gram matrix is bordered with b = X'y (row B) and
e₁ = the y_{t-1} unit vector (row E); after eliminating the first k
real columns the Schur complement holds
  r[B,B] = RSS of the k-regressor model  (nested RSS for free),
  r[B,E] = −e₁'A⁻¹b  → β₁ = −r[B,E] at full elimination,
  r[E,E] = −e₁'A⁻¹e₁ → (X'X)⁻¹[1,1] = −r[E,E].
Each elimination applies  r[i,j] −= (r[i,k]·r[j,k])/r[k,k]  in a fixed
order, so the Python driver solve and the SQL oracle (a recursive CTE
whose per-iteration state is the flattened matrix as a list — rows,
not an expression DAG, so nothing for a planner to inline) execute the
IDENTICAL floating-point tree. Degenerate pivots (x/0 → NULL in
DuckDB, None here) propagate to the reference's −1.0 sentinel.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F

from .stationarity import _P, _TAU, _tau_pvalue

MAXLAG = 20


def _g(p: int, i: int, j: int) -> str:
    return f"g{p}_{i}_{j}"


def _y(p: int, i: int) -> str:
    return f"y{p}_{i}"


def input_names(maxlag: int = MAXLAG) -> list[str]:
    names = []
    for p in range(maxlag + 1):
        m = p + 2
        for i in range(m):
            for j in range(i + 1):
                names.append(_g(p, i, j))
        for i in range(m):
            names.append(_y(p, i))
        names.append(f"yy{p}")
    return names


# --------------------------------------------------------------------------
# Driver-side solve (Python mirror of the SQL recursion)
# --------------------------------------------------------------------------


def _ldl_eliminate(mat: dict, m: int) -> list:
    """Right-looking LDL elimination of the bordered Gram matrix.

    ``mat`` maps (i1, i2), i2 ≤ i1, over real columns 0..m-1 plus
    borders B=m (X'y | y'y) and E=m+1 (e₁ | 0). Entries may be None
    (SQL NULL). Returns rss_after[k] = r[B,B] after k eliminations,
    k = 0..m; mutates ``mat`` to the fully eliminated state."""
    B, E = m, m + 1
    rss_after = [mat.get((B, B))]
    for k in range(m):
        d = mat.get((k, k))
        for i1 in range(k + 1, m + 2):
            a = mat.get((i1, k))
            for i2 in range(k + 1, i1 + 1):
                b = mat.get((i2, k))
                old = mat.get((i1, i2))
                if old is None or a is None or b is None or d is None or d == 0.0:
                    mat[(i1, i2)] = None
                else:
                    mat[(i1, i2)] = old - (a * b) / d
        rss_after.append(mat.get((B, B)))
    return rss_after


def _border_init(r: dict, p: int) -> tuple[dict, int]:
    """Build the bordered matrix for candidate p from one agg row."""
    m = p + 2
    B, E = m, m + 1
    mat: dict = {}
    for i in range(m):
        for j in range(i + 1):
            mat[(i, j)] = r[_g(p, i, j)]
    for i in range(m):
        mat[(B, i)] = r[_y(p, i)]
    mat[(B, B)] = r[f"yy{p}"]
    for i in range(m):
        mat[(E, i)] = 1.0 if i == 1 else 0.0
    mat[(E, B)] = 0.0
    mat[(E, E)] = 0.0
    return mat, m


def solve_adf_row(r: dict, maxlag: int = MAXLAG) -> dict:
    """Full autolag solve for one series' Gram sums (an agg row dict).

    Returns {adf_stat, p_value, used_lag, n} with the −1 sentinel on
    degenerate input — mirroring the SQL oracle's NULL collapse."""
    # selection: nested RSS from the p=maxlag elimination
    sel_mat, sel_m = _border_init(r, maxlag)
    n_sel = r[_g(maxlag, 0, 0)]
    rss_after = _ldl_eliminate(sel_mat, sel_m)
    candidates = []
    for p in range(maxlag + 1):
        rss = rss_after[p + 2]
        if rss is None or n_sel is None or rss <= 0 or n_sel <= 0:
            continue
        aic = n_sel * math.log(rss / n_sel) + 2 * (p + 2)
        candidates.append((aic, p))
    if not candidates:
        return {"adf_stat": -1.0, "p_value": -1.0, "used_lag": -1, "n": -1}
    _, best = min(candidates)

    # refit the chosen p on its own (longer) sample
    m = best + 2
    B, E = m, m + 1
    mat, _ = _border_init(r, best)
    n_p = r[_g(best, 0, 0)]
    _ldl_eliminate(mat, m)
    rss, rbe, ree = mat.get((B, B)), mat.get((E, B)), mat.get((E, E))
    if rss is None or rbe is None or ree is None or n_p is None:
        return {"adf_stat": -1.0, "p_value": -1.0, "used_lag": -1, "n": -1}
    b1, inv11 = -rbe, -ree
    dof = n_p - m
    if dof <= 0 or rss <= 0 or inv11 <= 0:
        return {"adf_stat": -1.0, "p_value": -1.0, "used_lag": -1, "n": -1}
    var = rss / dof * inv11
    if var <= 0:
        return {"adf_stat": -1.0, "p_value": -1.0, "used_lag": -1, "n": -1}
    stat = b1 / math.sqrt(var)
    return {
        "adf_stat": stat,
        "p_value": _tau_pvalue(stat),
        "used_lag": best,
        "n": int(n_p),
    }


# --------------------------------------------------------------------------
# SQL oracle (DuckDB): the identical recursion as a recursive CTE
# --------------------------------------------------------------------------
# Matrix state per (event_type, p): the bordered lower triangle
# flattened row-major as a LIST (1-indexed k; k-1 = i1*(i1+1)/2 + i2).
# One recursion iteration eliminates one real column for every
# candidate p at once; rows stop when j = m_p. Recursive-CTE iterations
# materialize, so the shared-subexpression DAG that explodes a flat
# projection chain never forms.


def _flat(i1: int, i2: int) -> int:
    return i1 * (i1 + 1) // 2 + i2 + 1  # 1-indexed for DuckDB lists


def oracle_sql(maxlag: int = MAXLAG) -> str:
    """Full DuckDB oracle for the autolag ADF panel over `events` log
    returns per event_type — identical elimination arithmetic to
    solve_adf_row.

    Gram-sum layout: LONG FORM with a single SUM aggregate. Each Δy row
    explodes into its 276 (i1, i2) products (global variable indexing:
    0=const, 1=y_lag, 2..21=Δy lags, 22=Δy itself for the X'y / y'y
    border); per-candidate-p sums are suffix sums at the trim cutpoint,
    recovered as total − head-prefix. A 21×277-column masked-aggregate
    fan OOMs DuckDB v1.0's grouped aggregation nondeterministically
    under threading — one narrow SUM over exploded rows is linear and
    memory-flat, and at 100 TB the same shape is a single map-side
    combinable shuffle."""
    D = maxlag + 2  # global border index for Δy (the regressand)
    lag_cols = ", ".join(
        f"LAG(dy, {i}) OVER w2 AS dl{i}" for i in range(1, maxlag + 1)
    )

    def v(i: int) -> str:
        if i == 0:
            return "1.0"
        if i == 1:
            return "ylag"
        if i <= maxlag + 1:
            return f"dl{i - 1}"
        return "dy"

    prods = []
    for i1 in range(maxlag + 2):
        for i2 in range(i1 + 1):
            prods.append(f"{{'i1': {i1}, 'i2': {i2}, 'v': {v(i1)}*{v(i2)}}}")
    for i2 in range(maxlag + 2):
        prods.append(f"{{'i1': {D}, 'i2': {i2}, 'v': dy*{v(i2)}}}")
    prods.append(f"{{'i1': {D}, 'i2': {D}, 'v': dy*dy}}")

    plist = ", ".join(f"({p})" for p in range(maxlag + 1))
    evals = []
    for p in range(maxlag + 1):
        e = p + 3
        base = e * (e + 1) // 2
        for i2 in range(p + 4):
            evals.append(f"({p}, {base + i2 + 1}, {'1.0' if i2 == 1 else '0.0'})")
    sel = maxlag
    pv = _tau_pvalue_sql("s.stat")
    # decode flat k (1-indexed) -> (i1, i2); exact for k ≤ a few thousand
    i1d = "CAST(FLOOR((SQRT(8.0*(k-1)+1.0)-1.0)/2.0) AS BIGINT)"
    return f"""
WITH RECURSIVE r AS (
  SELECT event_type, ts, event_id,
         LN(GREATEST(value, 1e-10))
           - LAG(LN(GREATEST(value, 1e-10))) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS lr
  FROM events
), d1 AS (
  SELECT event_type, ts, event_id, lr,
         LAG(lr) OVER w AS ylag,
         lr - LAG(lr) OVER w AS dy
  FROM r WHERE lr IS NOT NULL
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), d2 AS (
  SELECT event_type, ylag, dy, {lag_cols},
         ROW_NUMBER() OVER w2 AS rn
  FROM d1 WHERE dy IS NOT NULL
  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id)
), long AS (
  SELECT event_type, rn, u.i1 AS i1, u.i2 AS i2, u.v AS prod
  FROM d2, UNNEST([{", ".join(prods)}]) AS t(u)
), tot AS (
  SELECT event_type, i1, i2, SUM(prod) AS s
  FROM long GROUP BY event_type, i1, i2
), plist(p) AS (
  VALUES {plist}
), cc AS (
  -- head-prefix sums: Σ products over rn ≤ p (the rows each candidate
  -- p trims away); ≤ maxlag rows per series, so the inequality join
  -- stays tiny
  SELECT l.event_type, pl.p, l.i1, l.i2, SUM(l.prod) AS c
  FROM long l JOIN plist pl ON l.rn <= pl.p
  WHERE l.rn <= {maxlag}
  GROUP BY l.event_type, pl.p, l.i1, l.i2
), gp AS (
  SELECT t.event_type, pl.p, t.i1, t.i2,
         t.s - COALESCE(c.c, 0.0) AS val
  FROM tot t CROSS JOIN plist pl
  LEFT JOIN cc c ON c.event_type = t.event_type AND c.p = pl.p
                AND c.i1 = t.i1 AND c.i2 = t.i2
  WHERE (t.i1 <= pl.p + 1)
     OR (t.i1 = {D} AND (t.i2 <= pl.p + 1 OR t.i2 = {D}))
), entries AS (
  SELECT event_type, p,
         CASE WHEN i1 < {D} THEN i1*(i1+1)//2 + i2 + 1
              WHEN i2 < {D} THEN (p+2)*(p+3)//2 + i2 + 1
              ELSE (p+2)*(p+3)//2 + (p+2) + 1 END AS lf,
         val
  FROM gp
  UNION ALL
  SELECT ser.event_type, ev.p, ev.lf, ev.val
  FROM (SELECT DISTINCT event_type FROM tot) ser
  CROSS JOIN (VALUES {", ".join(evals)}) AS ev(p, lf, val)
), init AS (
  SELECT event_type, p, p + 2 AS m,
         MAX(CASE WHEN lf = 1 THEN val END) AS n,
         0 AS j,
         list(val ORDER BY lf) AS mat
  FROM entries GROUP BY event_type, p
), elim AS (
  SELECT event_type, p, m, n, j, mat FROM init
  UNION ALL
  SELECT event_type, p, m, n, j + 1,
         list_transform(range(1, len(mat) + 1), k ->
           CASE WHEN {i1d} > j AND (k - 1 - ({i1d})*({i1d}+1)//2) > j
                THEN mat[k] - (mat[({i1d})*({i1d}+1)//2 + j + 1]
                               * mat[(k - 1 - ({i1d})*({i1d}+1)//2)
                                     * ((k - 1 - ({i1d})*({i1d}+1)//2) + 1)//2 + j + 1])
                             / mat[j*(j+1)//2 + j + 1]
                ELSE mat[k] END) AS mat
  FROM elim WHERE j < m
), aic AS (
  SELECT event_type, j - 2 AS p,
         CASE WHEN mat[{_flat(sel + 2, sel + 2)}] > 0 AND n > 0
              THEN n * LN(mat[{_flat(sel + 2, sel + 2)}] / n) + 2.0 * j
         END AS aic
  FROM elim WHERE p = {sel} AND j BETWEEN 2 AND m
), best AS (
  SELECT event_type, p AS best_p
  FROM (SELECT event_type, p, aic,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY (aic IS NULL), aic, p) AS rn
        FROM aic)
  WHERE rn = 1 AND aic IS NOT NULL
), refit AS (
  SELECT event_type, p, n, m,
         mat[(m)*(m+1)//2 + m + 1] AS rss,
         -mat[(m+1)*(m+2)//2 + m + 1] AS b1,
         -mat[(m+1)*(m+2)//2 + m + 2] AS inv11
  FROM elim WHERE j = m
), stat AS (
  SELECT r.event_type, r.p, r.n,
         CASE WHEN r.n - r.m > 0 AND r.rss > 0 AND r.inv11 > 0
                   AND r.rss / (r.n - r.m) * r.inv11 > 0
              THEN r.b1 / SQRT(r.rss / (r.n - r.m) * r.inv11)
         END AS stat
  FROM refit r JOIN best b ON b.event_type = r.event_type AND b.best_p = r.p
)
SELECT g.event_type,
       CASE WHEN s.stat IS NULL THEN -1.0 ELSE ROUND(s.stat, 6) END AS adf_stat,
       CASE WHEN s.stat IS NULL THEN -1.0 ELSE ROUND({pv}, 3) END AS p_value,
       CASE WHEN s.stat IS NULL THEN -1 ELSE s.p END AS used_lag,
       CASE WHEN s.stat IS NULL THEN -1 ELSE CAST(s.n AS BIGINT) END AS n
FROM (SELECT DISTINCT event_type FROM tot) g
LEFT JOIN stat s ON s.event_type = g.event_type
"""


def _tau_pvalue_sql(col: str) -> str:
    """Piecewise-linear τ_μ p-value interpolation, identical breakpoints
    and slopes to stationarity._tau_pvalue (np.interp)."""
    parts = [f"CASE WHEN {col} <= {float(_TAU[0])!r} THEN {float(_P[0])!r}"]
    for i in range(1, len(_TAU)):
        slope = float((_P[i] - _P[i - 1]) / (_TAU[i] - _TAU[i - 1]))
        parts.append(
            f"WHEN {col} <= {float(_TAU[i])!r} THEN {float(_P[i - 1])!r}"
            f" + ({col} - ({float(_TAU[i - 1])!r})) * {slope!r}"
        )
    parts.append(f"ELSE {float(_P[-1])!r} END")
    return " ".join(parts)


# --------------------------------------------------------------------------
# Spark side: distributed Gram aggregation + driver solve
# --------------------------------------------------------------------------


def adf_autolag_panel(
    df: DataFrame,
    value_col: str,
    series_cols: list[str],
    order_cols: list[str],
    maxlag: int = MAXLAG,
) -> list[dict]:
    """Per-series autolag ADF: one window pass builds Δy and its lags;
    ONE aggregation computes the 277 global Gram sums over the maxlag-
    trimmed sample (all candidate samples share it); the ≤maxlag "head"
    rows each candidate re-admits are collected (≤ 20 rows/series) and
    their corrections added on the driver:
        g{p} = Σ_{trimmed} + Σ_{head rows rn ≥ p+1}.
    This keeps the distributed pass narrow (no 21× per-candidate
    aggregate fan) — the per-candidate arithmetic is O(maxlag³) driver
    numpy on sums, never on rows."""
    D = maxlag + 2  # global index of Δy (regressand border)
    w = Window.partitionBy(*series_cols).orderBy(*order_cols)
    y = F.col(value_col)
    d = (
        df.withColumn("_ylag", F.lag(value_col).over(w))
        .withColumn("_dy", y - F.col("_ylag"))
    )
    for i in range(1, maxlag + 1):
        d = d.withColumn(f"_dl{i}", F.lag("_dy", i).over(w))
    d = d.filter(F.col("_dy").isNotNull()).withColumn("_rn", F.row_number().over(w))
    # two actions read the lag frame (totals agg + head collect): pay the
    # 20-lag window once
    d = d.persist()

    def v(i: int):
        if i == 0:
            return F.lit(1.0)
        if i == 1:
            return F.col("_ylag")
        if i <= maxlag + 1:
            return F.col(f"_dl{i - 1}")
        return F.col("_dy")

    pairs = [(i1, i2) for i1 in range(D) for i2 in range(i1 + 1)]
    pairs += [(D, i2) for i2 in range(D)] + [(D, D)]

    # Gram totals over the maxlag-trimmed sample via per-batch BLAS
    # partials: numpy computes X'X per Arrow batch (277 products × rows
    # as ONE gemm), Spark shuffles only the tiny (series, pair, partial)
    # rows — the 277-expression interpreted aggregate this replaces was
    # ~10× slower at sf0.1
    import pandas as pd

    key_fields = [f for f in d.schema.fields if f.name in series_cols]
    schema_str = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["pair_idx INT", "partial DOUBLE"]
    )
    lag_names = [f"_dl{i}" for i in range(1, maxlag + 1)]
    pair_arr = np.array(pairs)

    def gram_partials(batches):
        for pdf in batches:
            pdf = pdf[pdf["_rn"] > maxlag]
            if not len(pdf):
                continue
            for kv, grp in pdf.groupby(series_cols, sort=False):
                if not isinstance(kv, tuple):
                    kv = (kv,)
                X = np.column_stack(
                    [np.ones(len(grp)), grp["_ylag"].to_numpy()]
                    + [grp[c].to_numpy() for c in lag_names]
                    + [grp["_dy"].to_numpy()]
                )
                G = X.T @ X
                out = pd.DataFrame(
                    {
                        "pair_idx": np.arange(len(pairs), dtype="int32"),
                        "partial": G[pair_arr[:, 0], pair_arr[:, 1]],
                    }
                )
                for name, val in zip(series_cols, kv):
                    out[name] = val
                yield out[[*series_cols, "pair_idx", "partial"]]

    tot_long = (
        d.mapInPandas(gram_partials, schema_str)
        .groupBy(*series_cols, "pair_idx")
        .agg(F.sum("partial").alias("s"))
        .collect()
    )
    totals: dict[tuple, dict] = {}
    for r in tot_long:
        key = tuple(r[k] for k in series_cols)
        i1, i2 = pairs[r["pair_idx"]]
        totals.setdefault(key, {})[(i1, i2)] = r["s"]
    head_rows = (
        d.filter(F.col("_rn") <= maxlag)
        .select(
            *series_cols, "_rn", "_ylag", "_dy",
            *[f"_dl{i}" for i in range(1, maxlag + 1)],
        )
        .collect()
    )
    d.unpersist()

    def vval(row, i: int):
        if i == 0:
            return 1.0
        if i == 1:
            return row["_ylag"]
        if i <= maxlag + 1:
            return row[f"_dl{i - 1}"]
        return row["_dy"]

    heads: dict[tuple, list] = {}
    for r in head_rows:
        heads.setdefault(tuple(r[k] for k in series_cols), []).append(r)

    out = []
    for key in sorted(set(totals) | set(heads)):
        tr = totals.get(key, {})
        hs = sorted(heads.get(key, []), key=lambda r: r["_rn"])
        inputs: dict = {}
        for p in range(maxlag + 1):
            m = p + 2
            admit = [r for r in hs if r["_rn"] >= p + 1]
            for i1 in range(m):
                for i2 in range(i1 + 1):
                    s = tr.get((i1, i2)) or 0.0
                    for r in admit:
                        s = s + vval(r, i1) * vval(r, i2)
                    inputs[_g(p, i1, i2)] = s
            for i2 in range(m):
                s = tr.get((D, i2)) or 0.0
                for r in admit:
                    s = s + r["_dy"] * vval(r, i2)
                inputs[_y(p, i2)] = s
            s = tr.get((D, D)) or 0.0
            for r in admit:
                s = s + r["_dy"] * r["_dy"]
            inputs[f"yy{p}"] = s
        res = solve_adf_row(inputs, maxlag)
        out.append({**dict(zip(series_cols, key)), **res})
    return out


def adfuller_numpy(x: np.ndarray, maxlag: int = MAXLAG) -> tuple[float, int, int]:
    """Test-oracle replica of statsmodels adfuller(x, maxlag, autolag=
    'AIC', regression='c') via direct lstsq fits — used only in tests to
    validate the Gram/LDL path against an independent formulation.
    Returns (adf_stat, used_lag, nobs_used)."""
    x = np.asarray(x, dtype=float)
    dx = np.diff(x)
    nsel = len(dx) - maxlag

    def design(p: int, trim: int):
        nobs = len(dx) - trim
        cols = [np.ones(nobs), x[trim:-1] if trim else x[:-1]]
        for i in range(1, p + 1):
            cols.append(dx[trim - i : len(dx) - i])
        return np.column_stack(cols), dx[trim:]

    aics = []
    for p in range(maxlag + 1):
        X, yv = design(p, maxlag)
        beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
        rss = float(np.sum((yv - X @ beta) ** 2))
        aics.append(nsel * math.log(rss / nsel) + 2 * (p + 2))
    best = int(np.argmin(aics))
    X, yv = design(best, best)
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    rss = float(np.sum((yv - X @ beta) ** 2))
    nobs = len(yv)
    cov = rss / (nobs - X.shape[1]) * np.linalg.inv(X.T @ X)
    stat = float(beta[1] / math.sqrt(cov[1, 1]))
    return stat, best, nobs
