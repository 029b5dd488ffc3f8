"""Deterministic event waves + sequential twins for the streaming queries.

Generates a seeded, multi-wave event feed (each wave = one file = one
micro-batch via maxFilesPerTrigger=1) with genuine late stragglers, and
computes the EXPECTED emitted rows of the two streaming operators in
streaming/windows.py with plain dict/loop code — no Spark — mirroring
the pinned Structured-Streaming semantics:

* watermark before batch b = max event time over batches < b minus the
  delay (starts at epoch 0);
* a row is dropped, and a window/timeout fires, only when the watermark
  STRICTLY exceeds the window end / timeout timestamp;
* the final no-data micro-batch flushes with the final watermark.

Equality edges are designed out of the data so the strict-vs-inclusive
ambiguity can never matter: event times are ≡13 (mod 60), the watermark
≡12 (delay 7201 s), session timeouts ≡20 (gap 1807 s), and window ends
≡0 — four residues that never collide.

Values are integer quarters (k/4) so every per-window double sum is
exact regardless of the engine's summation order.
"""

from __future__ import annotations

import os
import random

TYPES = ("click", "view", "error")

BASE_S = 1_700_000_000 - (1_700_000_000 % 3600)  # hour-aligned epoch base
WAVE_STEP_S = 3 * 3600
WINDOW_S = 3600
DELAY_S = 7201
GAP_S = 1807


def event_waves(
    n_waves: int = 4, per_wave: int = 150, users: int = 8, seed: int = 11
) -> list[list[tuple[int, int, int, str, float]]]:
    """Waves of (event_id, ts_s, user_id, event_type, value). ~15% of
    each wave are stragglers up to 9 h behind "now" — far below the
    watermark, so real late-drops occur."""
    rng = random.Random(seed)
    waves: list[list[tuple[int, int, int, str, float]]] = []
    eid = 0
    for w in range(n_waves):
        now = BASE_S + (w + 1) * WAVE_STEP_S
        rows: list[tuple[int, int, int, str, float]] = []
        used: set[tuple[int, int]] = set()
        # guarantee the wave advances the watermark by ~one wave step
        anchors = [(now - 47, rng.randrange(users))]
        while len(rows) < per_wave:
            if anchors:
                t, user = anchors.pop()
            else:
                back = (
                    rng.randrange(3 * 3600, 9 * 3600)
                    if rng.random() < 0.15
                    else rng.randrange(0, 2 * 3600)
                )
                t = now - back
                t = t - t % 60 + 13  # ≡13 mod 60
                user = rng.randrange(users)
            if (user, t) in used:
                continue
            used.add((user, t))
            rows.append((eid, t, user, TYPES[rng.randrange(3)], rng.randrange(0, 400) / 4))
            eid += 1
        waves.append(rows)
    return waves


def write_event_waves(dir_path: str, waves) -> None:
    """One parquet file per wave, mtimes strictly increasing so the file
    stream processes them in wave order (one wave per micro-batch)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dir_path, exist_ok=True)
    for i, rows in enumerate(waves):
        path = os.path.join(dir_path, f"wave{i:03d}.parquet")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts_s": pa.array([r[1] for r in rows], pa.int64()),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array([r[3] for r in rows], pa.string()),
                    "value": pa.array([r[4] for r in rows], pa.float64()),
                }
            ),
            path,
        )
        os.utime(path, (1_000_000 + i * 100, 1_000_000 + i * 100))


def event_waves_dupes(
    n_waves: int = 4, per_wave: int = 150, users: int = 8, seed: int = 11
) -> list[list[tuple[int, int, int, str, float]]]:
    """The same feed as ``event_waves`` plus at-least-once delivery:
    each wave after the first replays ~20 rows of the previous wave
    verbatim (same event_id/ts/payload). Some replays fall behind the
    watermark by then (late-dropped), the rest are exact duplicates
    (state-dropped) — both deduplication paths are exercised."""
    rng = random.Random(seed * 7919 + 13)
    waves = [list(w) for w in event_waves(n_waves, per_wave, users, seed)]
    for w in range(1, n_waves):
        replays = rng.sample(waves[w - 1], 20)
        waves[w].extend(replays)
    return waves


def dedup_expected(
    waves, delay_s: int = DELAY_S
) -> list[tuple[int, int, int, str, float]]:
    """Expected emitted rows of dedup_events under the same two-watermark
    discipline as the windowed twin: batch b late-filters with the
    watermark as of batch b-1, so a replay is either late-dropped
    (below that watermark) or state-dropped (its key's state cannot have
    been evicted yet, because eviction uses the same lagged threshold).
    The seen-set therefore only ever needs to grow."""
    wm_filter = 0
    wm_evict = 0
    seen: set[tuple[int, int]] = set()
    out: list[tuple[int, int, int, str, float]] = []
    for wave in waves:
        for eid, t, user, typ, val in wave:
            if wm_filter > t * 1000:
                continue
            if (eid, t) in seen:
                continue
            seen.add((eid, t))
            out.append((eid, t, user, typ, val))
        wm_filter = wm_evict
        wm_evict = max(wm_evict, max(r[1] for r in wave) * 1000 - delay_s * 1000)
    return sorted(out)


def windowed_counts_expected(
    waves, window_s: int = WINDOW_S, delay_s: int = DELAY_S
) -> list[tuple[int, int, str, int, float]]:
    """Expected emitted rows of windowed_event_counts under Spark's
    two-watermark discipline (3.4+): batch b filters late rows with the
    watermark as of batch b-1 (``watermarkForLateEvents``) and evicts
    state with the watermark as of batch b (``watermarkForEviction``).
    Eviction is monotone and the lagged filter drops everything aimed at
    an evicted window, so the final output is: every group accumulated
    under the lagged filter whose end the FINAL watermark passed
    (strictly)."""
    wm_filter = 0  # f(batches < b-1)
    wm_evict = 0  # f(batches < b)
    state: dict[tuple[int, int, str], tuple[int, float]] = {}
    for wave in waves:
        for _eid, t, _user, typ, val in wave:
            ws = t - t % window_s
            we = ws + window_s
            if wm_filter > we * 1000:
                continue
            n, s = state.get((ws, we, typ), (0, 0.0))
            state[(ws, we, typ)] = (n + 1, s + val)
        wm_filter = wm_evict
        wm_evict = max(wm_evict, max(r[1] for r in wave) * 1000 - delay_s * 1000)
    return sorted(
        (ws, we, typ, n, s)
        for (ws, we, typ), (n, s) in state.items()
        if wm_evict > we * 1000
    )


def sessions_expected(
    waves, gap_s: int = GAP_S, delay_s: int = DELAY_S
) -> list[tuple[int, int, int, int]]:
    """Expected emitted rows of sessionize_users, mirroring the stateful
    UDF batch by batch: survivors extend/close sessions, a data-less
    user whose timeout fell behind the watermark times out, remaining
    sessions flush in the final no-data batch iff the final watermark
    passed their timeout."""
    gap_ms = gap_s * 1000
    wm_ms = 0
    state: dict[int, tuple[int, int, int, int]] = {}  # user -> (start,last,n,to)
    out: list[tuple[int, int, int, int]] = []
    for wave in waves:
        by_user: dict[int, list[int]] = {}
        for _eid, t, user, _typ, _val in wave:
            by_user.setdefault(user, []).append(t)
        for user, ts_list in by_user.items():
            st = state.get(user)
            start, last, n, prev_to = st if st else (None, None, 0, None)
            survivors = sorted(t for t in ts_list if t * 1000 > wm_ms)
            for t in survivors:
                if start is None:
                    start = last = t
                    n = 1
                elif t - last > gap_s:
                    out.append((user, start, last, n))
                    start = last = t
                    n = 1
                else:
                    last = max(last, t)
                    n += 1
            if start is not None:
                to = max(last * 1000 + gap_ms, wm_ms + 1)
                if not survivors and prev_to is not None:
                    to = max(prev_to, wm_ms + 1)
                state[user] = (start, last, n, to)
        for user in list(state):
            if user in by_user:
                continue
            start, last, n, to = state[user]
            if to < wm_ms:
                out.append((user, start, last, n))
                del state[user]
        wm_ms = max(wm_ms, max(r[1] for r in wave) * 1000 - delay_s * 1000)
    for user in sorted(state):
        start, last, n, to = state[user]
        if to < wm_ms:
            out.append((user, start, last, n))
    return sorted(out)


def ensure_stream_oracle(out_dir: str, seed: int = 11) -> dict[str, str]:
    """Materialize the default-seed expected outputs to parquet for the
    driver's DuckDB oracles. Returns {"windowed": path, "sessions": path}."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    waves = event_waves(seed=seed)

    win = windowed_counts_expected(waves)
    win_tbl = pa.table(
        {
            "win_start": pa.array([r[0] for r in win], pa.int64()),
            "win_end": pa.array([r[1] for r in win], pa.int64()),
            "event_type": pa.array([r[2] for r in win], pa.string()),
            "n_events": pa.array([r[3] for r in win], pa.int64()),
            "sum_value": pa.array([r[4] for r in win], pa.float64()),
        }
    )

    dd = dedup_expected(event_waves_dupes(seed=seed))
    dd_tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in dd], pa.int64()),
            "ts_s": pa.array([r[1] for r in dd], pa.int64()),
            "user_id": pa.array([r[2] for r in dd], pa.int64()),
            "event_type": pa.array([r[3] for r in dd], pa.string()),
            "value": pa.array([r[4] for r in dd], pa.float64()),
        }
    )

    ses = sessions_expected(waves)
    ses_tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in ses], pa.int64()),
            "session_start": pa.array([r[1] for r in ses], pa.int64()),
            "session_end": pa.array([r[2] for r in ses], pa.int64()),
            "n_events": pa.array([r[3] for r in ses], pa.int64()),
        }
    )

    out = {}
    for name, tbl in (
        ("windowed", win_tbl),
        ("sessions", ses_tbl),
        ("dedup", dd_tbl),
    ):
        path = os.path.join(out_dir, f"oracle_stream_{name}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        out[name] = path
    return out
