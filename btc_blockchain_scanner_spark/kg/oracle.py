"""Single-threaded pure-Python reference-semantics oracle for the KG
pipeline (SURVEY.md §5: "end-to-end triple-set comparison with P/R>=0.95
against the reference-semantics oracle").

Implements the same extraction/linking/canonicalization semantics as the
Spark pipeline with none of its machinery — plain dicts and a union-find —
so tests can compare the distributed result against an independently
written implementation.
"""

from __future__ import annotations

import hashlib
import re

from .vocab import ALIASES, ENTITIES, PREDICATES

TOKEN_RE = re.compile(r"[a-z0-9]+")
_SURFACES = frozenset(ENTITIES) | frozenset(ALIASES)
_PREDS = frozenset(PREDICATES)


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def extract_turn(text: str):
    toks = [(m.group(0), m.start(), m.end()) for m in TOKEN_RE.finditer(text.lower())]
    mentions = [
        (i, t, s, e, "exact" if t in ENTITIES else "alias")
        for i, (t, s, e) in enumerate(toks)
        if t in _SURFACES
    ]
    mpos = {i: t for i, t, *_ in mentions}
    triples = [
        (t, toks[i + 1][0], mpos[i + 2], i)
        for i, t, s, e, k in mentions
        if i + 2 in mpos and i + 1 < len(toks) and toks[i + 1][0] in _PREDS
    ]
    return mentions, triples


def resolve(surface: str) -> str:
    if surface in ENTITIES:
        return surface
    return ALIASES.get(surface, surface)


def assign_ids(keys: set[str]) -> dict[str, int]:
    """dense ids ordered by md5(key), starting at 1 — must match
    link.get_or_create_entities on an empty existing table."""
    return {k: i + 1 for i, k in enumerate(sorted(keys, key=md5))}


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # merge into the smaller id — the reference's min-wallet rule
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.p[hi] = lo


def run(turns: list[tuple[str, int, str]]):
    """turns = [(conv_id, turn_idx, text)] → dict of oracle tables.

    Returns entity_ids (key→id), mention rows, entity-level triple rows,
    and canon map (entity_id→canon_id) from per-turn co-mention edges.
    """
    all_mentions, all_triples = [], []
    for conv_id, turn_idx, text in turns:
        ms, ts = extract_turn(text)
        for pos, surface, s, e, kind in ms:
            all_mentions.append((conv_id, turn_idx, pos, surface, s, e, kind))
        for subj, pred, obj, pos in ts:
            all_triples.append((conv_id, turn_idx, subj, pred, obj, pos))

    keys = {resolve(m[3]) for m in all_mentions}
    ids = assign_ids(keys)

    triples_linked = [
        (c, t, ids[resolve(s)], p, ids[resolve(o)], pos)
        for c, t, s, p, o, pos in all_triples
    ]

    uf = UnionFind()
    for eid in ids.values():
        uf.find(eid)
    per_turn: dict[tuple[str, int], set[int]] = {}
    for c, t, pos, surface, *_ in all_mentions:
        per_turn.setdefault((c, t), set()).add(ids[resolve(surface)])
    for members in per_turn.values():
        ms = sorted(members)
        for a, b in zip(ms, ms[1:]):
            uf.union(a, b)
    canon = {eid: uf.find(eid) for eid in ids.values()}

    return {
        "mentions": all_mentions,
        "triples": triples_linked,
        "entity_ids": ids,
        "canon": canon,
    }


def precision_recall(pred: set, truth: set) -> tuple[float, float]:
    if not pred and not truth:
        return 1.0, 1.0
    tp = len(pred & truth)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(truth) if truth else 0.0
    return p, r
