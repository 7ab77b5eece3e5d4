"""Deterministic synthetic transcript-stream generator (reference CDCMockApp
analogue — ConnectionUtils.java:84-137 / BusiDetail.java:62-84 / CDCMockApp.java:20-48,
rebuilt without MySQL/Canal/Kafka: a seeded generator emits Canal-JSON
envelopes directly to JSON-line files that Structured Streaming's file source
consumes as a simulated broker).

Stream variants (FIXTURES.md §1): (a) in-order, (b) out-of-order within the
watermark, (c) late beyond the watermark, (d) exact duplicates (same
conv_id+turn_idx — dedup/replay tests), (e) DELETE events. Skew: a configurable
set of mega-conversations holding a large share of turns (north_rule skew
clause). Everything is seeded — two runs produce byte-identical streams.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "python", "browser", "calculator", "none"]
WORDS = (
    "key agg row scan merge batch window sort table value part hash spark "
    "plan shuffle join filter state stream commit snapshot offset turn"
).split()

EPOCH = datetime(2024, 9, 1, tzinfo=timezone.utc)


@dataclass
class GenConfig:
    n_convs: int = 50
    turns_per_conv: int = 20
    mega_convs: int = 2  # skewed conversations
    mega_turns: int = 400
    seed: int = 42
    gap_seconds: int = 60  # base inter-turn gap
    session_break_every: int = 8  # every k turns, jump > session gap
    session_break_seconds: int = 3600
    ooo_fraction: float = 0.1  # out-of-order within watermark
    ooo_max_lag: int = 120  # seconds (inside a 10-min watermark)
    late_fraction: float = 0.02  # late beyond watermark
    late_lag: int = 7200  # seconds (outside a 10-min watermark)
    dup_fraction: float = 0.05
    delete_fraction: float = 0.02
    n_partitions: int = 4
    database: str = "chat"
    table: str = "transcripts"


def _text(rng: random.Random, conv: str, idx: int) -> str:
    n = 4 + rng.randrange(8)
    body = " ".join(rng.choice(WORDS) for _ in range(n))
    return f"[{conv}#{idx}] {body}"


def turns(cfg: GenConfig) -> list[dict]:
    """Ground-truth turns, in event-time order per conversation."""
    rng = random.Random(cfg.seed)
    out: list[dict] = []
    sizes = [cfg.turns_per_conv] * cfg.n_convs + [cfg.mega_turns] * cfg.mega_convs
    for ci, size in enumerate(sizes):
        conv = f"c{ci:05d}"
        t = EPOCH + timedelta(seconds=rng.randrange(86400))
        for idx in range(size):
            gap = cfg.gap_seconds + rng.randrange(cfg.gap_seconds)
            if idx > 0 and idx % cfg.session_break_every == 0:
                gap += cfg.session_break_seconds
            t = t + timedelta(seconds=gap)
            role = "user" if idx % 2 == 0 else (
                "tool" if rng.random() < 0.2 else "assistant"
            )
            out.append(
                {
                    "conv_id": conv,
                    "turn_idx": idx,
                    "role": role,
                    "text": _text(rng, conv, idx),
                    "tool": rng.choice(TOOLS[:-1]) if role == "tool" else None,
                    "ts": t,
                }
            )
    return out


def _fmt_ts(t: datetime) -> str:
    return t.strftime("%Y-%m-%d %H:%M:%S")


def envelopes(cfg: GenConfig) -> list[dict]:
    """Arrival-ordered Canal-JSON envelopes (with simulated Kafka metadata).

    Arrival order ≠ event-time order: a seeded shuffle displaces
    ``ooo_fraction`` of turns by ≤ ooo_max_lag (inside the watermark) and
    ``late_fraction`` by late_lag (beyond it); duplicates and DELETEs are
    injected per config. Offsets are per-partition monotonic, partition =
    hash(conv_id) % n_partitions — exactly Kafka's keyed-producer layout.
    """
    rng = random.Random(cfg.seed + 1)
    base = turns(cfg)
    # arrival time = event time, displaced for ooo/late rows
    arrivals: list[tuple[datetime, dict, str]] = []
    for rec in base:
        r = rng.random()
        if r < cfg.late_fraction:
            at = rec["ts"] + timedelta(seconds=cfg.late_lag)
        elif r < cfg.late_fraction + cfg.ooo_fraction:
            at = rec["ts"] + timedelta(seconds=rng.randrange(cfg.ooo_max_lag))
        else:
            at = rec["ts"]
        arrivals.append((at, rec, "INSERT"))
        if rng.random() < cfg.dup_fraction:
            arrivals.append(
                (at + timedelta(seconds=1), rec, "INSERT")
            )  # exact duplicate payload, new offset
        if rng.random() < cfg.delete_fraction:
            arrivals.append((at + timedelta(seconds=5), rec, "DELETE"))
    arrivals.sort(key=lambda x: (x[0], x[1]["conv_id"], x[1]["turn_idx"], x[2]))

    next_offset = [0] * cfg.n_partitions
    out = []
    for at, rec, op in arrivals:
        part = hash_partition(rec["conv_id"], cfg.n_partitions)
        off = next_offset[part]
        next_offset[part] += 1
        ts_ms = int(at.timestamp() * 1000)
        out.append(
            {
                "data": [
                    {
                        "conv_id": rec["conv_id"],
                        "turn_idx": str(rec["turn_idx"]),
                        "role": rec["role"],
                        "text": rec["text"],
                        "tool": rec["tool"] if rec["tool"] is not None else "null",
                        "ts": _fmt_ts(rec["ts"]),
                    }
                ],
                "database": cfg.database,
                "table": cfg.table,
                "type": op,
                "isDdl": False,
                "ts": ts_ms,
                "es": ts_ms - 500,
                "old": None,
                "pkNames": ["conv_id", "turn_idx"],
                "sql": "",
                "_offset": off,
                "_partition": part,
            }
        )
    return out


def hash_partition(key: str, n: int) -> int:
    """Deterministic partitioner (stable across runs, unlike hash())."""
    h = 0
    for ch in key:
        h = (h * 31 + ord(ch)) & 0x7FFFFFFF
    return h % n


def write_stream_files(
    cfg: GenConfig, out_dir: str, files: int = 8
) -> list[str]:
    """Write envelopes as JSON-line files, arrival-ordered chunks.

    Each file is one micro-batch's worth of broker traffic; dropping files
    into the directory one-by-one drives a Structured Streaming file source
    like a live topic. Returns the file paths (not yet moved into out_dir —
    see tests for incremental feeding)."""
    os.makedirs(out_dir, exist_ok=True)
    envs = envelopes(cfg)
    chunk = max(1, (len(envs) + files - 1) // files)
    paths = []
    for i in range(0, len(envs), chunk):
        p = os.path.join(out_dir, f"batch-{i // chunk:05d}.jsonl")
        with open(p, "w") as fh:
            for e in envs[i : i + chunk]:
                fh.write(json.dumps(e, separators=(",", ":")) + "\n")
        paths.append(p)
    return paths
