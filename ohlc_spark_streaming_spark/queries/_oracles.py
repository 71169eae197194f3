"""Oracle SQL shared across query families.

Lives in its own module (no registry import) so any query module can be
imported directly without triggering the registry's populate-on-import
cycle.
"""

OHLC_ORACLE = """
SELECT
  date_trunc('hour', ts)                        AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR      AS window_end,
  event_type                                    AS symbol,
  min(struct_pack(t := ts, p := value)).p       AS open,
  max(value)                                    AS high,
  min(value)                                    AS low,
  max(struct_pack(t := ts, p := value)).p       AS close,
  CAST(count(*) AS DOUBLE)                      AS volume,
  count(*)                                      AS n_trades
FROM events
GROUP BY 1, 2, 3
"""

from ..functions import hashing  # noqa: E402

_TOKENS_SQL = "string_split(text, ' ')"


def shingle_sql_cte(base: str = "documents") -> str:
    """Shared DuckDB CTEs producing per-doc shingle hashes (twin of
    operators.dedup.shingle_hashes: broadcast token dictionary + positional
    combination, parallel-unnest zipping for token positions). ``base``
    names the (doc_id, text) relation to shingle — a table or an earlier
    CTE (corpus_curation_report shingles the exact-dedup keeps)."""
    th = hashing.rolling_hash_sql("tok")
    return f"""
toks AS (
  SELECT doc_id, {_TOKENS_SQL} AS ts FROM {base}
), tokh AS (
  SELECT tok, {th} AS th
  FROM (SELECT DISTINCT unnest({_TOKENS_SQL}) AS tok FROM {base})
), tp AS (
  SELECT doc_id, unnest(ts) AS tok, unnest(range(1, len(ts) + 1)) AS pos FROM toks
), tk AS (
  SELECT doc_id, pos, th FROM tp JOIN tokh USING (tok)
), shg AS (
  SELECT doc_id,
         (th * 961 + lead(th, 1) OVER w * 31 + lead(th, 2) OVER w) % {hashing.P} AS sh
  FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(th, 2) OVER w IS NOT NULL
)"""


def minhash_sql_cte(base: str = "documents") -> str:
    """Per-doc MinHash signatures over shingle hashes."""
    mins = ", ".join(
        f"{expr} AS mh{i}" for i, expr in enumerate(hashing.minhash_sql("sh"))
    )
    return f"""{shingle_sql_cte(base)},
sig AS (
  SELECT doc_id, {mins} FROM shg GROUP BY doc_id
)"""


def minhash_bands_sql() -> str:
    parts = []
    for j in range(hashing.N_BANDS):
        key = hashing.band_key_sql(
            f"mh{j * hashing.BAND_ROWS}", f"mh{j * hashing.BAND_ROWS + 1}"
        )
        parts.append(f"SELECT doc_id, {j} AS band, {key} AS key FROM sig")
    return " UNION ALL ".join(parts)


def minhash_pairs_sql(threshold: float) -> str:
    """Full MinHash-LSH verified-pair replay (id_a, id_b, jaccard) —
    shared by dedup_minhash_lsh (queries/llm.py) and the split-leakage
    audit (queries/analytics.py)."""
    return f"""WITH {minhash_sql_cte()},
bands AS ({minhash_bands_sql()}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
), sets AS (
  SELECT doc_id, list(DISTINCT sh) AS units, count(DISTINCT sh) AS n_units
  FROM shg GROUP BY doc_id
)
SELECT
  id_a, id_b,
  len(list_intersect(sa.units, sb.units))
    / (sa.n_units + sb.n_units - len(list_intersect(sa.units, sb.units))) AS jaccard
FROM cand
JOIN sets sa ON sa.doc_id = id_a
JOIN sets sb ON sb.doc_id = id_b
WHERE len(list_intersect(sa.units, sb.units))
    / (sa.n_units + sb.n_units - len(list_intersect(sa.units, sb.units))) >= {threshold}"""


def jaccard_pairs_global_sql(threshold: float) -> str:
    """Global exact shingle-Jaccard pairs (id_a < id_b, J ≥ threshold) —
    the plain shared-shingle count join; shared by dedup_jaccard_ppjoin
    (queries/llm.py) and the MinHash recall audit (queries/analytics.py)."""
    return f"""WITH {shingle_sql_cte().lstrip()},
perdoc AS (
  SELECT DISTINCT doc_id, sh FROM shg
), n AS (
  SELECT doc_id, count(*) AS n FROM perdoc GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM perdoc a JOIN perdoc b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT inter.id_a, inter.id_b, inter.i / (na.n + nb.n - inter.i) AS jaccard
FROM inter
JOIN n na ON inter.id_a = na.doc_id
JOIN n nb ON inter.id_b = nb.doc_id
WHERE inter.i / (na.n + nb.n - inter.i) >= {threshold}"""


ANOMALY_ZSCORE_ORACLE = """
WITH stats AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(12,6))
                  * CAST(value AS DECIMAL(12,6))) AS DOUBLE) AS ss
  FROM events GROUP BY event_type
),
bounds AS (
  SELECT event_type, n, s / n AS mean,
         sqrt(greatest(ss / n - (s / n) * (s / n), 0.0)) AS sd
  FROM stats
)
SELECT
  e.event_type,
  any_value(b.n)                                   AS n_events,
  CAST(SUM(CASE WHEN abs(e.value - b.mean) > 3 * b.sd THEN 1 ELSE 0 END)
       AS BIGINT)                                  AS n_anomalies,
  min(CASE WHEN abs(e.value - b.mean) > 3 * b.sd THEN e.event_id END)
                                                   AS first_anomaly_id
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
"""
