"""Seeded synthetic corpus of interleaved text+media documents.

Generates the ``documents (doc_id, spans)`` input table fixed by
BASELINE.json's ``input_hint`` plus exact ground truth (``triples_ref``,
``alias_groups_ref``) so extraction → linking → canonicalization is measurable
with exact P/R. Mirrors the *kinds* of surface variation the reference's
merge stages handle: case/whitespace variants (folded by the exact-dedup
normalize), company-suffix and punctuation variants and ≤2-edit typos (the
KNN-0.9 + edit-distance<3 + judge path — /root/reference/graph/processing/
similar_entity.py:315-353 and config/prompt.py:120-137 examples).

Everything is a pure function of (seed, n_docs). Entity mention frequencies
are Zipf-distributed to create the hot-key skew the canonicalization shuffle
must salt. Canonical names are generated with pairwise edit distance > 4 so
the <3 gate can never merge two distinct entities.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Dict, List

import numpy as np
import pyarrow as pa

from .functions.text import edit_distance, normalize_surface
from . import schema as S

ENTITY_TYPES = ["person", "organization", "technology", "location", "event", "concept"]

# pred -> in-sentence phrase (the generator's grammar AND the mock extractor's
# taxonomy — the equivalent of the prompt's relationship_types list)
PRED_PHRASES: Dict[str, str] = {
    "works_at": "works at",
    "located_in": "is located in",
    "develops": "develops",
    "collaborates_with": "collaborates with",
    "leads": "leads",
    "uses": "uses",
    "founded": "founded",
    "part_of": "is part of",
}

_SYLLABLES = [
    "zor", "vel", "dra", "quin", "mar", "tek", "lun", "bex", "cor", "dal",
    "fen", "gri", "hol", "jas", "kel", "lom", "nar", "pex", "ruv", "sol",
    "tam", "urn", "wix", "yel", "oza", "bri", "cam", "dex", "eri", "fol",
]

FILLER_SENTENCES = [
    "The quarterly report was filed on schedule。",
    "Several committees met to discuss routine matters。",
    "Weather conditions remained stable throughout the period。",
    "Archive maintenance continued without incident。",
    "The annual review cycle concluded quietly。",
    "Routine inspections were completed across the region。",
]


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big")


def _make_name(rng: np.random.Generator) -> str:
    parts = []
    for _ in range(2):
        n_syll = int(rng.integers(2, 4))
        word = "".join(rng.choice(_SYLLABLES) for _ in range(n_syll))
        parts.append(word.capitalize())
    return " ".join(parts)


@dataclass
class SynthCorpus:
    documents: pa.Table       # (doc_id, spans) — the pipeline input
    triples_ref: pa.Table     # ground truth (canonical subj, pred, obj, doc_id, weight)
    alias_groups: pa.Table    # canonical_id -> surface_forms (normalized)
    entity_types: Dict[str, str]  # canonical_id -> type


def _variants(name: str, rng: np.random.Generator) -> List[str]:
    """Surface variants the linking stages must merge back. Index 0 is the
    base form; generator guarantees it is the strict majority form."""
    out = [name]
    roll = rng.random(4)
    if roll[0] < 0.5:
        out.append(name.upper())             # folded by exact normalize
    if roll[1] < 0.4:
        out.append(name + " Inc")            # suffix variant (judge rule)
    if roll[2] < 0.3:
        out.append(name.replace(" ", "-"))   # punctuation variant (edit gate)
    if roll[3] < 0.25:
        # true typo (adjacent transposition inside the SECOND word, keeping
        # the prefix-block key intact): edit distance 2 < 3, exercising the
        # reference's apoc.text.distance gate
        words = name.split(" ")
        w = words[-1]
        if len(w) >= 4:
            i = 1 + int(rng.integers(0, len(w) - 2))
            words[-1] = w[:i] + w[i + 1] + w[i] + w[i + 2:]
            out.append(" ".join(words))
    return out


def generate(n_docs: int = 100, seed: int = 42,
             n_entities: int | None = None,
             facts_per_doc: int = 6,
             media_rate: float = 0.03) -> SynthCorpus:
    rng = np.random.default_rng(seed)
    n_entities = n_entities or max(20, n_docs // 2)

    # --- closed world: canonical entities, pairwise edit distance > 4 ---
    names: List[str] = []
    while len(names) < n_entities:
        cand = _make_name(rng)
        if all(edit_distance(cand.upper(), n.upper(), 4) > 4 for n in names):
            names.append(cand)
    types = {n: ENTITY_TYPES[_h("type|" + n) % len(ENTITY_TYPES)] for n in names}
    variants = {n: _variants(n, rng) for n in names}

    # --- fact universe: Zipf-weighted subjects for hot-key skew ---
    preds = list(PRED_PHRASES)
    zipf_w = 1.0 / np.arange(1, n_entities + 1, dtype=np.float64)
    zipf_w /= zipf_w.sum()

    doc_ids: List[str] = []
    spans_col: List[List[dict]] = []
    t_subj: List[str] = []
    t_pred: List[str] = []
    t_obj: List[str] = []
    t_doc: List[str] = []
    t_w: List[float] = []

    # pre-compute per-entity lookups + a weight memo (the sha1 per triple is
    # the single hottest call at bench corpus sizes)
    norm_names = [normalize_surface(n) for n in names]
    weight_memo: Dict[tuple, float] = {}

    # batched draws: one vectorized RNG call per quantity for the whole corpus
    n_facts_all = rng.integers(max(1, facts_per_doc - 2), facts_per_doc + 3,
                               size=n_docs)
    total_facts = int(n_facts_all.sum())
    si_all = rng.choice(n_entities, p=zipf_w, size=total_facts)
    oi_all = rng.choice(n_entities, p=zipf_w, size=total_facts)
    pred_all = rng.integers(len(preds), size=total_facts)
    s_roll = rng.random(total_facts)
    o_roll = rng.random(total_facts)
    s_vari = rng.integers(0, 4, size=total_facts)  # modded by len(variants)
    o_vari = rng.integers(0, 4, size=total_facts)

    fact_idx = 0
    for d in range(n_docs):
        doc_id = f"doc-{d:08d}"
        sentences: List[str] = []
        n_facts = int(n_facts_all[d])
        for _ in range(n_facts):
            si = int(si_all[fact_idx])
            oi = int(oi_all[fact_idx])
            if oi == si:
                oi = (si + 1) % n_entities
            s_name, o_name = names[si], names[oi]
            pred = preds[int(pred_all[fact_idx])]
            # base form strictly majority: 70% base, rest uniform over variants
            sv = variants[s_name]
            ov = variants[o_name]
            s_surf = s_name if s_roll[fact_idx] < 0.7 else sv[int(s_vari[fact_idx]) % len(sv)]
            o_surf = o_name if o_roll[fact_idx] < 0.7 else ov[int(o_vari[fact_idx]) % len(ov)]
            sentences.append(
                f"The {types[s_name]} {s_surf} {PRED_PHRASES[pred]} "
                f"the {types[o_name]} {o_surf}。"
            )
            t_subj.append(norm_names[si])
            t_pred.append(pred)
            t_obj.append(norm_names[oi])
            t_doc.append(doc_id)
            wk = (si, pred, oi)
            w = weight_memo.get(wk)
            if w is None:
                w = float(1 + _h(f"w|{s_name}|{pred}|{o_name}") % 10)
                weight_memo[wk] = w
            t_w.append(w)
            fact_idx += 1
        # filler interleaved
        n_fill = int(rng.integers(2, 6))
        for _ in range(n_fill):
            sentences.insert(
                int(rng.integers(0, len(sentences) + 1)),
                FILLER_SENTENCES[int(rng.integers(len(FILLER_SENTENCES)))],
            )

        # pack sentences into text spans (1-4 sentences each), interleave media
        spans: List[dict] = []
        offset = 0
        i = 0
        while i < len(sentences):
            k = int(rng.integers(1, 5))
            text = " ".join(sentences[i : i + k])
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
            offset += len(text) + 1
            i += k
            if rng.random() < media_rate * 4:  # per-span prob ≈ media_rate per sentence
                kind = "image" if rng.random() < 0.7 else "audio"
                spans.append({
                    "kind": kind, "text": "",
                    "media_ref": f"media://{doc_id}/{len(spans)}",
                    "offset": offset,
                })
                offset += 1
        doc_ids.append(doc_id)
        spans_col.append(spans)

    documents = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=S.DOCUMENTS
    )
    triples_ref = pa.table({
        "subj": pa.array(t_subj), "pred": pa.array(t_pred), "obj": pa.array(t_obj),
        "doc_id": pa.array(t_doc), "weight": pa.array(t_w, pa.float32()),
    })
    alias_groups = pa.table({
        "canonical_id": [normalize_surface(n) for n in names],
        "surface_forms": [
            sorted({normalize_surface(v) for v in variants[n]}) for n in names
        ],
    })
    return SynthCorpus(
        documents=documents,
        triples_ref=triples_ref,
        alias_groups=alias_groups,
        entity_types={normalize_surface(n): t for n, t in types.items()},
    )


def write_corpus(corpus: SynthCorpus, out_dir: str) -> None:
    import os
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(corpus.documents, f"{out_dir}/documents.parquet")
    pq.write_table(corpus.triples_ref, f"{out_dir}/triples_ref.parquet")
    pq.write_table(corpus.alias_groups, f"{out_dir}/alias_groups.parquet")
