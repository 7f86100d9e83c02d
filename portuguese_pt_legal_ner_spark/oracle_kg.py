"""Serial oracle for the KG stages (triples, linking, components).

Pure-Python twins of the Spark operators, implementing kg_spec.py
over the serial reference path (reference_path.mentions_for_turn).
Used by parity tests: Spark output must match these at P/R ≥ 0.95
(target 1.0). Kept dependency-free and deliberately naive — clarity
over speed; this is the semantic yardstick, not the engine.
"""

from __future__ import annotations

from .kg_spec import EXCLUDED_ROLES, PREDICATES, SUBJECT_LABELS
from .reference_path import mentions_for_turn
from .synth import normalize_surface


def triples_for_conversation(turns: list[dict]) -> list[dict]:
    """kg_spec R1–R6 over one conversation's turns (dicts with
    conv_id, turn_idx, role, text, tool)."""
    # collect mentions per paragraph, in (turn_idx, para_idx) order
    paragraphs: list[tuple[int, int, str, str | None, list[dict]]] = []
    for turn in sorted(turns, key=lambda t: t["turn_idx"]):
        if turn["role"] in EXCLUDED_ROLES:  # R1
            continue
        rows = mentions_for_turn(turn["conv_id"], turn["turn_idx"], turn["text"])
        by_para: dict[int, list[dict]] = {}
        for row in rows:
            by_para.setdefault(row["para_idx"], []).append(row)
        for para_idx in sorted(by_para):
            paragraphs.append(
                (turn["turn_idx"], para_idx, turn["role"], turn["tool"],
                 sorted(by_para[para_idx], key=lambda r: r["start"]))
            )

    triples: list[dict] = []
    current_subj: dict | None = None
    for turn_idx, para_idx, role, tool, mentions in paragraphs:
        para_subj = next(
            (m for m in mentions if m["label"] in SUBJECT_LABELS), None
        )  # R2 (mentions already start-ordered)
        if para_subj is not None:
            current_subj = para_subj
        if current_subj is None:  # R3: nothing to inherit yet
            continue
        subj = current_subj
        for m in mentions:
            if (
                m["turn_idx"] == subj["turn_idx"]
                and m["para_idx"] == subj["para_idx"]
                and m["start"] == subj["start"]
            ):
                continue  # R4: subject mention itself excluded
            pred = PREDICATES[(subj["label"], m["label"])]
            triples.append(
                {
                    "subj": subj["surface"],
                    "subj_label": subj["label"],
                    "pred": pred,
                    "obj": m["surface"],
                    "obj_label": m["label"],
                    "conv_id": m["conv_id"],
                    "turn_idx": turn_idx,
                    "para_idx": para_idx,
                    "obj_start": m["start"],
                    "role": role,
                    "tool": tool,
                }
            )
    # R6: stable ordering
    triples.sort(key=lambda t: (t["conv_id"], t["turn_idx"], t["para_idx"], t["obj_start"]))
    return triples


def triples_for_corpus(turns: list[dict]) -> list[dict]:
    by_conv: dict[str, list[dict]] = {}
    for turn in turns:
        by_conv.setdefault(turn["conv_id"], []).append(turn)
    out: list[dict] = []
    for conv_id in sorted(by_conv):
        out.extend(triples_for_conversation(by_conv[conv_id]))
    return out


def link_surfaces(
    surfaces: list[tuple[str, str]], alias_rows: list[dict]
) -> dict[tuple[str, str], str]:
    """Serial alias-dictionary linking: (surface, label) → canonical.
    Exact normalized match only (the LSH path has its own tests)."""
    index = {
        (row["alias_norm"], row["label"]): row["canonical"] for row in alias_rows
    }
    out = {}
    for surface, label in surfaces:
        canonical = index.get((normalize_surface(surface), label))
        if canonical is not None:
            out[(surface, label)] = canonical
    return out


def connected_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find ground truth: node → min node id of its component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {node: find(node) for node in parent}
