"""Seeded synthetic transcripts + alias dictionary generators.

BASELINE.json's ``input_hint`` mandates an Iceberg table of multi-turn
transcripts ``(conv_id string, turn_idx int32, role string, text
string, tool string, ts timestamp)``; no external data exists in the
sandbox, so tests and benches synthesize it deterministically here
(seeded ``random.Random``, never ``Date.now``-style entropy). Modeled
on the reference's own synthetic-fixture precedent
(``create_sample_data``, src/data.py:98-153) and its worked examples
(INFERENCE_README.md:53-58, examples/inference_example.py:66-70),
which are embedded verbatim as fixed turns so goldens tie directly to
reference documentation.

Skew is planted intentionally: ``Tribunal de Justiça`` appears in
roughly a third of entity-bearing turns — the ultra-frequent key that
exercises salted aggregation downstream.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

# The three documented inference examples (INFERENCE_README.md:54-58)
# and the three example-script texts (examples/inference_example.py:66-70).
REFERENCE_DOC_SENTENCES = [
    "O réu João Silva foi notificado em Lisboa, em 12/02/1990.",
    "A empresa Tech Solutions Ltda. está sediada no Porto e foi fundada em janeiro de 2020.",
    "O processo número 1234/2023 será julgado pelo Tribunal da Relação de Coimbra no dia 15 de março de 2024.",
    "O processo número 12345/2023 do réu João Silva foi julgado em 15 de março de 2023.",
    "Maria Santos, residente na Rua da Liberdade 123, 1000-001 Lisboa, contactável através do email maria@exemplo.pt.",
    "O Tribunal de Justiça de Lisboa decidiu sobre o caso com matrícula AB-12-34.",
]

_PER = ["João Silva", "Maria Santos", "António Costa", "Ana Pereira", "Carlos Mendes"]
_ORG_COMMON = "Tribunal de Justiça"   # the skewed heavy hitter
_ORG = ["Ministério Público", "Tech Solutions Ltda.", "Supremo Tribunal Administrativo",
        "Tribunal de Justiça de Lisboa", "TJ Lisboa"]
_LOC = ["Lisboa", "Porto", "Coimbra", "Braga"]
_DAT = ["12/02/1990", "15 de março de 2023", "03/07/2021", "1 de janeiro de 2024"]
_IDP = ["processo número 12345/2023", "processo 987/2021", "CC 12345678"]
_TEL = ["+351 912 345 678", "+351 218 765 432"]
_EMAIL = ["maria@exemplo.pt", "joao.silva@tribunal.pt", "geral@techsolutions.pt"]
_CEP = ["1000-001", "4000-322"]
_MAT = ["AB-12-34", "ZX-98-76"]

_TOOLS = ["case_lookup", "doc_search", "citation_check"]
_ROLES = ["user", "assistant", "tool", "system"]

_TEMPLATES = [
    "O réu {per} foi notificado em {loc}, em {dat}.",
    "O {org} julgou o {idp} em {dat}.",
    "{per} apresentou recurso no {org} em {loc}.",
    "Contacto: {tel}, email {email}, morada {cep} {loc}.",
    "A viatura com matrícula {mat} pertence a {per}.",
    "O {idp} foi distribuído ao {org}.",
    "{per} reside em {loc} desde {dat}.",
    "Audiência marcada para {dat} no {org} de {loc}.",
    "Sem entidades relevantes nesta intervenção processual.",
    "O mandatário de {per} juntou procuração em {dat}.\nNotificado o {org} em {loc}.",
]


def _fill(template: str, rng: random.Random) -> str:
    org = _ORG_COMMON if rng.random() < 0.45 else rng.choice(_ORG)
    return template.format(
        per=rng.choice(_PER), org=org, loc=rng.choice(_LOC),
        dat=rng.choice(_DAT), idp=rng.choice(_IDP), tel=rng.choice(_TEL),
        email=rng.choice(_EMAIL), cep=rng.choice(_CEP), mat=rng.choice(_MAT),
    )


def generate_conversation(
    c: int,
    seed: int = 42,
    min_turns: int = 3,
    max_turns: int = 12,
) -> list[dict]:
    """Deterministic rows for conversation #c (input_hint schema).

    Seeded per conversation id (string seeds hash via SHA-512 inside
    ``random.Random`` — stable across processes, independent of
    PYTHONHASHSEED), so output is identical no matter how conversation
    ids are partitioned across executors — a requirement for the
    N-vs-4N-parallelism scaling evidence to compare identical inputs.
    """
    rng = random.Random(f"transcripts:{seed}:{c}")
    conv_id = f"conv_{c:06d}"
    base_ts = datetime(2024, 1, 1, 8, 0, 0) + timedelta(hours=c % 100_000)
    n_turns = rng.randint(min_turns, max_turns)
    rows: list[dict] = []
    for t in range(n_turns):
        role = _ROLES[rng.randrange(len(_ROLES))] if t > 0 else "user"
        tool = rng.choice(_TOOLS) if role == "tool" else None
        if c < len(REFERENCE_DOC_SENTENCES) and t == 1:
            # embed the documented reference sentences as fixed turns
            text = REFERENCE_DOC_SENTENCES[c]
        else:
            r = rng.random()
            if r < 0.02:
                text = ""             # edge: empty text
            elif r < 0.04:
                text = "   \n  "      # edge: whitespace-only
            else:
                text = _fill(rng.choice(_TEMPLATES), rng)
                if rng.random() < 0.15:  # edge: multi-line turn
                    text = text + "\n" + _fill(rng.choice(_TEMPLATES), rng)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": base_ts + timedelta(seconds=30 * t),
            }
        )
    return rows


def generate_transcripts(
    n_conversations: int = 200,
    seed: int = 42,
    min_turns: int = 3,
    max_turns: int = 12,
) -> list[dict]:
    """Deterministic transcript rows matching the input_hint schema."""
    rows: list[dict] = []
    for c in range(n_conversations):
        rows.extend(generate_conversation(c, seed, min_turns, max_turns))
    return rows


def generate_alias_dict() -> list[dict]:
    """Entity-linking dictionary (broadcast side), per FIXTURES.md §2."""
    canon = [
        # (canonical, label, aliases)
        ("João Silva", "PER", ["João Silva", "Joao Silva", "Silva, João"]),
        ("Maria Santos", "PER", ["Maria Santos", "M. Santos"]),
        ("António Costa", "PER", ["António Costa", "Antonio Costa"]),
        ("Ana Pereira", "PER", ["Ana Pereira"]),
        ("Carlos Mendes", "PER", ["Carlos Mendes"]),
        ("Tribunal de Justiça de Lisboa", "ORG",
         ["Tribunal de Justiça de Lisboa", "TJ Lisboa", "Tribunal de Justiça"]),
        ("Ministério Público", "ORG", ["Ministério Público", "MP"]),
        ("Tech Solutions Ltda.", "ORG", ["Tech Solutions Ltda.", "Tech Solutions"]),
        ("Supremo Tribunal Administrativo", "ORG",
         ["Supremo Tribunal Administrativo", "STA"]),
        ("Lisboa", "LOC", ["Lisboa"]),
        ("Porto", "LOC", ["Porto"]),
        ("Coimbra", "LOC", ["Coimbra"]),
        ("Braga", "LOC", ["Braga"]),
    ]
    rows = []
    for canonical, label, aliases in canon:
        for alias in aliases:
            rows.append(
                {
                    "alias_norm": normalize_surface(alias),
                    "canonical": canonical,
                    "label": label,
                }
            )
    return rows


def normalize_surface(surface: str) -> str:
    """Surface normalization shared by dict build and linking: lowercase,
    trim, collapse internal whitespace. Diacritics kept (Portuguese
    distinctions are meaningful); the MinHash-LSH stage handles
    diacritic-less near-duplicates."""
    return " ".join(surface.lower().split())
