"""ANSI-SQL (DuckDB) oracle generator for the match pipeline.

Renders a :class:`MatchConfig` into one self-contained SQL query that
reproduces the engine end-to-end — uniqueness weights (records.py:49-103),
blocking join (records.py:106-132), per-column gated scoring
(matcher.py:8-89, 184-200), exact-float argmax ties (matcher.py:202-208),
classification (matcher.py:357-385) and duplicate resolution
(matcher.py:408-447) — so the driver's DuckDB cross-check can validate the
whole matcher, not just toy aggregates.

Every floating-point operation mirrors the Spark expression tree in the
same order (same IEEE doubles ⇒ same tie sets ⇒ same statuses). Output
scores are additionally rounded to 6 dp as a final safety net.

Scorer SQL templates must stay in lock-step with
record_matcher_spark.functions.scorers — each template cites the Spark
expression it mirrors.
"""

from __future__ import annotations

from record_matcher_spark.config import MatchConfig


def _norm(col: str) -> str:
    """blank_coalesce twin: coalesce(cast(c as varchar), '')."""
    return f"coalesce(CAST({col} AS VARCHAR), '')"


def _tokens(e: str) -> str:
    # mirrors _tokens_expr: array_distinct(filter(split(trim(s),'\s+'), t!=''))
    return (
        f"list_distinct(list_filter(regexp_split_to_array(trim({e}), '\\s+'), "
        f"t -> t <> ''))"
    )


def scorer_sql(name: str, x: str, y: str) -> str:
    """DuckDB expression for scorer ``name`` over normalized operands."""
    if name == "exact_match":
        # mirrors F.when(x == y, 100.0).otherwise(0.0)
        return f"CASE WHEN {x} = {y} THEN 100.0 ELSE 0.0 END"
    if name == "levenshtein_ratio":
        # mirrors 100.0 * (1.0 - lev/CAST(greatest(len,len,1) AS double))
        return (
            f"100.0 * (1.0 - CAST(levenshtein({x}, {y}) AS DOUBLE) / "
            f"CAST(greatest(length({x}), length({y}), 1) AS DOUBLE))"
        )
    if name == "token_set_jaccard":
        tx, ty = _tokens(x), _tokens(y)
        inter = f"CAST(len(list_intersect({tx}, {ty})) AS DOUBLE)"
        union = f"CAST(len(list_distinct(list_concat({tx}, {ty}))) AS DOUBLE)"
        return (
            f"CASE WHEN {union} = 0 THEN 100.0 ELSE 100.0 * {inter} / {union} END"
        )
    if name == "jaro_winkler":
        # DuckDB's jaro_winkler_similarity matches the classic formula used
        # by our pandas UDF except both-blank (it returns 0, we define 100
        # consistently with exact_match on ''=='')
        return (
            f"CASE WHEN {x} = '' AND {y} = '' THEN 100.0 "
            f"ELSE 100.0 * jaro_winkler_similarity({x}, {y}) END"
        )
    raise KeyError(f"no SQL template for scorer {name!r}")


def _matcher_ctes(
    cfg: MatchConfig,
    x_sql: str,
    y_sql: str,
) -> str:
    """Shared CTE chain through ``resolved`` (phase1 + final status per x
    row) — consumed by the per-row and summary oracle renderers."""
    rules = cfg.rules
    req = float(cfg.required_threshold)
    dup = float(cfg.duplicate_threshold)

    # ---- x normalization, uniqueness, weights, optimal -----------------
    u_cols = ",\n         ".join(
        f"CAST(count(DISTINCT CASE WHEN {_norm(r.x_column)} <> '' THEN "
        f"{_norm(r.x_column)} END) AS DOUBLE) AS du_{i}"
        for i, r in enumerate(rules)
    )
    xs_cols = ",\n         ".join(
        f"{_norm(r.x_column)} AS xs_{i}" for i, r in enumerate(rules)
    )
    group_items = list(cfg.columns_to_group.items())
    gx_cols = "".join(
        f",\n         {_norm(xc)} AS gx_{j}" for j, (_, xc) in enumerate(group_items)
    )
    # u_sum accumulated in rule order (mirrors prepare_x)
    u_sum = "0.0"
    for i, r in enumerate(rules):
        u_sum += f" + CASE WHEN xs_{i} <> '' THEN du_{i} / n ELSE 0.0 END"
    w_cols = ",\n         ".join(
        f"CASE WHEN xs_{i} <> '' AND u_sum > 0 THEN (du_{i} / n) / u_sum "
        f"ELSE 0.0 END AS w_{i}"
        for i in range(len(rules))
    )
    optimal = "0.0"
    for i, r in enumerate(rules):
        optimal += f" + {float(r.threshold)!r} * w_{i}"

    # ---- y normalization -------------------------------------------------
    y_needed = sorted({yc for r in rules for yc in r.y_columns})
    ys_cols = "".join(
        f",\n         {_norm(c)} AS ys_{c}" for c in y_needed
    )
    gy_cols = "".join(
        f",\n         {_norm(yc)} AS gy_{j}" for j, (yc, _) in enumerate(group_items)
    )

    # ---- pair scoring ----------------------------------------------------
    s_cols = []
    for i, r in enumerate(rules):
        exprs = [scorer_sql(r.scorer, f"xs_{i}", f"ys_{yc}") for yc in r.y_columns]
        if not exprs:
            s = "0.0"
        elif len(exprs) == 1:
            s = exprs[0]
        else:
            s = "greatest(" + ", ".join(exprs) + ")"
        s_cols.append(f"{s} AS s_{i}")
    gates = [
        (f"s_{i} >= {float(r.threshold)!r}" if r.cutoff else f"s_{i} > 0.0")
        for i, r in enumerate(rules)
    ]
    row_score = "0.0"
    for i, g in enumerate(gates):
        row_score += f" + CASE WHEN {g} THEN s_{i} * w_{i} ELSE 0.0 END"
    any_gate = " OR ".join(f"({g})" for g in gates)

    join_cond = (
        " AND ".join(f"yn.gy_{j} = xo.gx_{j}" for j in range(len(group_items)))
        if group_items
        else "TRUE"
    )
    s_cols_sql = ",\n         ".join(s_cols)

    return f"""
WITH x_in AS ({x_sql}),
y_in AS ({y_sql}),
u_agg AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         {u_cols}
  FROM x_in
),
xn AS (
  SELECT x_in.{cfg.x_id} AS x_id,
         {xs_cols}{gx_cols},
         u_agg.*
  FROM x_in CROSS JOIN u_agg
),
xn2 AS (
  SELECT *, {u_sum} AS u_sum FROM xn
),
xw AS (
  SELECT *,
         {w_cols}
  FROM xn2
),
xo AS (
  SELECT *, {optimal} AS optimal FROM xw
),
yn AS (
  SELECT y_in.{cfg.y_id} AS y_id{ys_cols}{gy_cols}
  FROM y_in
),
pairs AS (
  SELECT xo.*, yn.y_id,
         {s_cols_sql}
  FROM xo JOIN yn ON {join_cond}
),
scored AS (
  SELECT x_id, y_id, optimal,
         ({row_score}) AS row_score,
         ({any_gate}) AS any_gate
  FROM pairs
),
entered AS (SELECT * FROM scored WHERE any_gate),
ranked AS (
  SELECT *, max(row_score) OVER (PARTITION BY x_id) AS mx FROM entered
),
tied AS (SELECT * FROM ranked WHERE row_score = mx),
agg AS (
  SELECT x_id,
         count(*) AS n_tied,
         max(row_score) AS best,
         max(optimal) AS opt,
         string_agg(CAST(y_id AS VARCHAR), ', ' ORDER BY y_id) AS tied_ids,
         min(y_id) AS first_y
  FROM tied GROUP BY x_id
),
cls AS (
  SELECT xo.x_id,
         CASE WHEN agg.x_id IS NULL OR agg.best < {req!r} THEN 'unmatched'
              WHEN agg.n_tied > 1 THEN 'ambiguous'
              WHEN agg.best <= agg.opt THEN 'review'
              ELSE 'matched' END AS phase1,
         agg.best, agg.n_tied, agg.tied_ids, agg.first_y
  FROM xo LEFT JOIN agg ON agg.x_id = xo.x_id
),
claims AS (
  SELECT x_id, first_y AS y_id, best FROM cls
  WHERE phase1 IN ('matched', 'review')
),
dupst AS (
  SELECT y_id, count(*) AS n_claims, max(best) AS mxs, min(best) AS mns
  FROM claims GROUP BY y_id
),
dupn AS (
  SELECT c.y_id,
         any_value(d.n_claims) AS n_claims,
         any_value(d.mxs) AS mxs,
         any_value(d.mns) AS mns,
         sum(CASE WHEN c.best = d.mxs THEN 1 ELSE 0 END) AS n_at_max
  FROM claims c JOIN dupst d ON c.y_id = d.y_id
  GROUP BY c.y_id
),
resolved AS (
  SELECT cls.*,
         CASE WHEN cl.y_id IS NOT NULL AND d.n_claims > 1
                   AND (d.n_at_max > 1 OR abs(d.mxs - d.mns) < {dup!r})
              THEN 'duplicate'
              WHEN cl.y_id IS NOT NULL AND d.n_claims > 1 AND cls.best <> d.mxs
              THEN 'unmatched'
              ELSE cls.phase1 END AS final_status
  FROM cls
  LEFT JOIN claims cl ON cl.x_id = cls.x_id
  LEFT JOIN dupn d ON d.y_id = cl.y_id
)"""


def matcher_oracle_sql(
    cfg: MatchConfig,
    x_sql: str,
    y_sql: str,
) -> str:
    """Full-pipeline per-row oracle: SELECT row_id, match_status,
    rows_matched, best_score (rounded 6dp, NULL when nothing
    passed/cleared), plus one column per ``columns_to_get`` target —
    pulled from the claimed y row when the final status is
    matched/review/duplicate, NULL otherwise (mirrors resolve.py's
    ``pull_ok`` projection; reference matcher.py:368-388 with the
    intended-semantics loser clearing).

    ``x_sql`` / ``y_sql``: subqueries producing the x and y tables with
    cfg.x_id / cfg.y_id id columns.
    """
    ctes = _matcher_ctes(cfg, x_sql, y_sql)
    pull_join = ""
    pull_cols = ""
    if cfg.columns_to_get:
        pv = ",\n         ".join(
            f"y_in.{yc} AS pv_{i}"
            for i, yc in enumerate(cfg.columns_to_get)
        )
        pull_join = (
            f",\nypull AS (SELECT y_in.{cfg.y_id} AS py,\n         {pv}\n"
            "  FROM y_in)"
        )
        pull_cols = "".join(
            f",\n       CASE WHEN final_status IN ('matched','review','duplicate')"
            f" THEN ypull.pv_{i} END AS {target}"
            for i, target in enumerate(cfg.columns_to_get.values())
        )
    from_clause = (
        "FROM resolved LEFT JOIN ypull ON ypull.py = resolved.first_y"
        if cfg.columns_to_get
        else "FROM resolved"
    )
    return f"""{ctes}{pull_join}
SELECT x_id AS row_id,
       upper(final_status) AS match_status,
       CASE WHEN final_status = 'unmatched' THEN ''
            ELSE coalesce(tied_ids, '') END AS rows_matched,
       CASE WHEN final_status = 'unmatched' THEN NULL
            ELSE round(best, 6) END AS best_score{pull_cols}
{from_clause}
"""


def matcher_summary_oracle_sql(
    cfg: MatchConfig,
    x_sql: str,
    y_sql: str,
) -> str:
    """Match-summary oracle (reference O12): one row per (summary_kind,
    status) with counts.

    ``final``: counts over the final status — the sane summary.
    ``ref_compat``: replicates the reference Counter, which increments for
    the phase-1 status AND AGAIN for each duplicate/unmatched re-mark
    (reference matcher.py:403, 431, 447).
    """
    ctes = _matcher_ctes(cfg, x_sql, y_sql)
    return f"""{ctes}
SELECT 'final' AS summary_kind, final_status AS status,
       CAST(count(*) AS BIGINT) AS n
FROM resolved GROUP BY final_status
UNION ALL
SELECT 'ref_compat' AS summary_kind, status,
       CAST(sum(n) AS BIGINT) AS n
FROM (
  SELECT phase1 AS status, count(*) AS n FROM resolved GROUP BY phase1
  UNION ALL
  SELECT final_status AS status, count(*) AS n FROM resolved
  WHERE final_status <> phase1 GROUP BY final_status
) GROUP BY status
"""
