"""Randomized equivalence: the declarative cache folds vs literal Python
reference folds (update.clj semantics), over hundreds of adversarial random
keys in ONE Spark job per operator.

The closed-form clamp (prefix-sum reflection, caches.py:118) is the one
place a subtle algebra error could silently produce plausible-but-wrong
counts, so it gets the widest random coverage: dec-heavy op mixes (clamp
engages often), timestamp collisions (the (ts, seq) tie-break carries),
dec-only keys (must vanish), and inc-after-clamp interleavings.
"""

from __future__ import annotations

import numpy as np

from streamsum_spark.operators.caches import (
    count_cache_inc_dec,
    keycount_with_undo,
    lastn_per_key,
)


def _random_ops(rng, n_keys: int, p_inc: float):
    """(key, op, ts, seq) rows: ts drawn from a tiny domain so collisions
    are common and ordering must fall back to seq."""
    rows = []
    for key in range(n_keys):
        n = int(rng.integers(1, 40))
        for i in range(n):
            op = "inc" if rng.random() < p_inc else "dec"
            rows.append((f"k{key}", op, int(rng.integers(0, 8)), i))
    return rows


def _clamp_fold(ops):
    """Literal update.clj:44-91: inc -> cnt+1, latest := max(latest, ts);
    dec -> cnt-1 iff cnt > 0, ts untouched."""
    cnt, latest, has_inc = 0, None, False
    for op, ts, _seq in sorted(ops, key=lambda o: (o[1], o[2])):
        if op == "inc":
            cnt += 1
            has_inc = True
            latest = ts if latest is None else max(latest, ts)
        elif cnt > 0:
            cnt -= 1
    return cnt, latest, has_inc


def test_clamp_closed_form_matches_reference_fold(spark):
    rng = np.random.default_rng(42)
    rows = _random_ops(rng, n_keys=300, p_inc=0.45)  # dec-heavy: clamp engages
    df = spark.createDataFrame(rows, "subject string, op string, ts long, seq long")
    got = {r.subject: (r.cnt, r.latest_ts) for r in count_cache_inc_dec(df).collect()}

    by_key: dict[str, list] = {}
    for k, op, ts, seq in rows:
        by_key.setdefault(k, []).append((op, ts, seq))
    expected = {}
    for k, ops in by_key.items():
        cnt, latest, has_inc = _clamp_fold(ops)
        if has_inc:  # dec never creates an entry (update.clj:83-91)
            expected[k] = (cnt, latest)
    assert got == expected


def test_keycount_undo_matches_reference_fold(spark):
    rng = np.random.default_rng(7)
    rows = _random_ops(rng, n_keys=300, p_inc=0.4)
    df = spark.createDataFrame(rows, "k string, op string, ts long, seq long")
    got = {r.k: r.cnt for r in keycount_with_undo(df).collect()}

    by_key: dict[str, list] = {}
    for k, op, ts, seq in rows:
        by_key.setdefault(k, []).append((op, ts, seq))
    expected = {}
    for k, ops in by_key.items():
        cnt = 0
        for op, _ts, _seq in sorted(ops, key=lambda o: (o[1], o[2])):
            cnt = cnt + 1 if op == "inc" else max(0, cnt - 1)
        expected[k] = cnt  # undo-only keys stay, at 0 (config.clj:38-45)
    assert got == expected


def test_lastn_window_matches_ring_buffer(spark):
    rng = np.random.default_rng(11)
    rows = []
    for key in range(100):
        for i in range(int(rng.integers(1, 50))):
            rows.append((f"k{key}", f"v{int(rng.integers(0, 6))}", int(rng.integers(0, 8)), i))
    df = spark.createDataFrame(rows, "k string, v string, ts long, seq long")
    got: dict[str, list] = {}
    for r in lastn_per_key(df, n=5).orderBy("k", "rn").collect():
        got.setdefault(r.k, []).append(r.v)

    expected = {}
    by_key: dict[str, list] = {}
    for k, v, ts, seq in rows:
        by_key.setdefault(k, []).append((v, ts, seq))
    for k, items in by_key.items():
        buf = []
        for v, _ts, _seq in sorted(items, key=lambda o: (o[1], o[2])):
            buf.append(v)
            if len(buf) > 5:
                buf.pop(0)  # evict oldest (caches.clj:51-75)
        expected[k] = list(reversed(buf))  # rn=1 newest
    assert got == expected
