"""DuckDB oracle builders for the BPE tokenizer family — a LEAF
module (imports only :mod:`.ann_oracles` for ``_materialize``), so
both :mod:`.llm` (train / encode entries) and :mod:`.streaming`
(the frozen-tokenizer serving twin) can use the builders at
registration time without a circular import — the ann_oracles
precedent applied to BPE."""

from __future__ import annotations

from .ann_oracles import _materialize


#: Registered BPE training depth — 10 is past the compounding point on
#: this corpus: steps 8/9 ('p ar'→par, 'm er'→mer) consume symbols
#: built by steps 7/1, the property a one-step exhibit cannot show.
_BPE_MERGES = 10


def _bpe_train_parts(n_merges: int = _BPE_MERGES) -> list[str]:
    """Materialized CTE chain replaying ``n_merges`` BPE rounds. Each
    round counts adjacent pairs over the (word, freq, idx, sym)
    relation, picks the (cnt DESC, pair ASC) winner, and applies it
    with the GREEDY NON-OVERLAPPING rule expressed relationally:
    consecutive matched positions only arise when left == right (a
    char run), and greedy takes the even offsets within each maximal
    run — gaps-and-islands (idx − row_number) finds the runs, a
    windowed min finds the offsets, and positions following a chosen
    match are dropped. Provably the same function as the Spark fold
    (operators/bpe.py apply_merge; adversarial parity pinned in
    tests/test_bpe.py). Shared by the trainer oracle (reads win{r})
    and the encoder oracle (reads syms{n})."""
    parts = [
        """WITH w AS (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) GROUP BY word
)""",
        """syms0 AS (
  SELECT word, freq, u.i AS idx, u.v AS sym
  FROM (SELECT word, freq,
               unnest(list_transform(string_split(word, ''),
                                     (x, i) -> {'i': i, 'v': x})) AS u
        FROM w)
)""",
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts += [
            f"""pc{r} AS (
  SELECT a.sym || ' ' || b.sym AS pair, CAST(sum(a.freq) AS BIGINT) AS cnt
  FROM syms{p} a JOIN syms{p} b ON a.word = b.word AND b.idx = a.idx + 1
  GROUP BY 1
)""",
            f"""win{r} AS (
  SELECT pair, string_split(pair, ' ')[1] AS l,
         string_split(pair, ' ')[2] AS rr, cnt
  FROM pc{r} ORDER BY cnt DESC, pair ASC LIMIT 1
)""",
            f"""m{r} AS (
  SELECT a.word, a.freq, a.idx, a.sym,
         coalesce(a.sym = (SELECT l FROM win{r})
                  AND b.sym = (SELECT rr FROM win{r}), FALSE) AS is_m
  FROM syms{p} a
  LEFT JOIN syms{p} b ON a.word = b.word AND b.idx = a.idx + 1
)""",
            f"""ch{r} AS (
  SELECT word, idx FROM (
    SELECT word, idx, idx - min(idx) OVER (PARTITION BY word, grp) AS off
    FROM (SELECT word, idx,
                 idx - row_number() OVER (PARTITION BY word
                                          ORDER BY idx) AS grp
          FROM m{r} WHERE is_m)
  ) WHERE off % 2 = 0
)""",
            f"""syms{r} AS (
  SELECT m.word, m.freq,
         row_number() OVER (PARTITION BY m.word ORDER BY m.idx) AS idx,
         CASE WHEN c.idx IS NOT NULL THEN m.sym || nxt.sym
              ELSE m.sym END AS sym
  FROM m{r} m
  LEFT JOIN ch{r} c ON c.word = m.word AND c.idx = m.idx
  LEFT JOIN ch{r} cp ON cp.word = m.word AND cp.idx = m.idx - 1
  LEFT JOIN syms{p} nxt ON nxt.word = m.word AND nxt.idx = m.idx + 1
  WHERE cp.idx IS NULL
)""",
        ]
    return _materialize(parts)


def _bpe_train_oracle(n_merges: int = _BPE_MERGES) -> str:
    """bpe_train_merges' oracle: the round chain + the merge table
    (one row per round winner)."""
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS step, pair, l || rr AS merged, cnt "
        f"FROM win{r}"
        for r in range(1, n_merges + 1)
    )
    return ",\n".join(_bpe_train_parts(n_merges)) + "\n" + rows


def _bpe_encode_oracle(n_merges: int = _BPE_MERGES) -> str:
    """bpe_encode_vocab's oracle: the training chain's final symbol
    relation IS the encoded vocabulary — per distinct word, its BPE
    segmentation, token count, and corpus frequency."""
    return ",\n".join(_bpe_train_parts(n_merges)) + f"""
SELECT word, CAST(any_value(freq) AS BIGINT) AS freq,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(sym, '|' ORDER BY idx) AS tokens
FROM syms{n_merges}
GROUP BY word
"""
