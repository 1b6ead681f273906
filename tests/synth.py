"""Deterministic reference-shaped fixture data (FIXTURES.md §A).

The reference's golden capture blob is git-LFS-missing, so tests regenerate a
structurally equivalent corpus: multi-client sync streams (random-walk
positions, shared timestamps → co-presence), interaction events, and draw
events with some strokeType/strokeId fields omitted (to exercise NULL-skipping
count semantics, process.py:391-392).
"""

from __future__ import annotations

import json
import random

SESSIONS = {126: 1630443513898, 127: 1630450000000}
CLIENTS = [1, 2, 5]
ENTITY_TYPES = [0, 1, 2, 3]


def make_rows(seed: int = 42, ticks_per_session: int = 120) -> list[dict]:
    rng = random.Random(seed)
    rows: list[dict] = []
    for session_id, start_ms in SESSIONS.items():
        capture_id = f"{session_id}_{start_ms}"
        seq = 0
        pos = {c: [rng.uniform(-2, 2) for _ in range(3)] for c in CLIENTS}
        for tick in range(ticks_per_session):
            ts = start_ms + tick * 50  # 50 ms cadence, shared across clients
            for client_id in CLIENTS:
                # sync rows: one entity per tick, random-walk position
                entity = ENTITY_TYPES[tick % len(ENTITY_TYPES)]
                p = pos[client_id]
                for i in range(3):
                    p[i] += rng.uniform(-0.05, 0.05)
                msg = {
                    "clientId": client_id,
                    "entityType": entity,
                    "pos": {"x": round(p[0], 6), "y": round(p[1], 6), "z": round(p[2], 6)},
                }
                rows.append(
                    dict(
                        capture_id=capture_id,
                        session_id=session_id,
                        client_id=client_id,
                        type="sync",
                        ts=ts,
                        seq=seq,
                        message=json.dumps(msg),
                    )
                )
                seq += 1
                if rng.random() < 0.25:
                    imsg = {
                        "clientId": client_id,
                        "interactionType": rng.randint(0, 3),
                        "sourceEntityId": rng.randint(0, 9),
                        "targetEntityId": rng.randint(0, 9),
                    }
                    rows.append(
                        dict(
                            capture_id=capture_id,
                            session_id=session_id,
                            client_id=client_id,
                            type="interaction",
                            ts=ts,
                            seq=seq,
                            message=json.dumps(imsg),
                        )
                    )
                    seq += 1
                if rng.random() < 0.15:
                    dmsg = {"clientId": client_id, "strokeId": rng.randint(0, 5)}
                    if rng.random() < 0.7:  # some draw rows omit strokeType
                        dmsg["strokeType"] = rng.randint(0, 2)
                    rows.append(
                        dict(
                            capture_id=capture_id,
                            session_id=session_id,
                            client_id=client_id,
                            type="draw",
                            ts=ts,
                            seq=seq,
                            message=json.dumps(dmsg),
                        )
                    )
                    seq += 1
    return rows


def make_captures(include_inflight: bool = True) -> list[dict]:
    caps = [
        dict(
            capture_id=f"{s}_{start}",
            session_id=s,
            start=start,
            end=start + 206_023,
            processed=None,
        )
        for s, start in SESSIONS.items()
    ]
    if include_inflight:  # end IS NULL → must be skipped (process.py:43)
        caps.append(
            dict(capture_id="999_1700000000000", session_id=999,
                 start=1700000000000, end=None, processed=None)
        )
    return caps
