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

# planted-community knobs: contiguous clusters of CLUSTER_SIZE entities;
# INTRA_P of facts stay inside the subject's cluster (strong modularity, so
# seeded Leiden-CPM recovers the planted partition — the LFR-style
# planted-partition benchmark). Subjects are cluster-uniform with Zipf skew
# WITHIN each cluster: every cluster hub is a hot key (the top member takes
# ~1/H(10) ≈ 34% of its cluster's mention mass), so the canonicalization
# shuffle still sees Zipf-hot keys while no cluster is starved of facts.
CLUSTER_SIZE = 10
INTRA_P = 0.97

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


def weight_for(s: str, p: str, o: str) -> float:
    """Relationship weight spec, shared by the generator and the mock
    extractor (the deterministic 'LLM knowledge'): a surface-level sha1 hash,
    so the same fact stated through different surface variants carries
    different weights — edge dedup must therefore aggregate order-free
    (max), which is what both the pipeline and the planted truth compute."""
    return float(1 + _h(f"w|{s}|{p}|{o}") % 10)


def _make_name(rng: np.random.Generator) -> str:
    parts = []
    for _ in range(2):
        n_syll = int(rng.integers(2, 4))
        word = "".join(rng.choice(_SYLLABLES) for _ in range(n_syll))
        parts.append(word.capitalize())
    return " ".join(parts)


def _structured_names(n: int, rng: np.random.Generator) -> List[str]:
    """O(n) generator of pairwise-well-separated names for LARGE entity
    vocabularies (the rejection-sampled ``_make_name`` loop is O(n²) and
    tops out around ~1k names). Construction: 32 base words of length 8
    with pairwise edit distance > 5 (checked — 32² comparisons, cheap);
    a name is 4 words indexed by the base-32 digits (d1, d2, d3) of its
    index plus a parity word c = (d1+d2+d3) mod 32. Any two distinct
    indices differ in ≥ 2 digit positions (single-parity code, min
    distance 2), so any two names differ by ≥ 2 substituted words → edit
    distance ≥ 12 > 8 — the same separation invariant the rejection
    sampler guarantees. Supports up to 32³ = 32768 names."""
    if n > 32 ** 3:
        raise ValueError(f"structured names support at most {32**3}, got {n}")
    letters = "abcdefghijklmnopqrstuvwxyz"
    words: List[str] = []
    while len(words) < 32:
        w = "".join(letters[int(i)] for i in rng.integers(26, size=8))
        if all(edit_distance(w, x, 5) > 5 for x in words):
            words.append(w.capitalize())
    out: List[str] = []
    for i in range(n):
        d1, d2, d3 = i % 32, (i // 32) % 32, (i // 1024) % 32
        c = (d1 + d2 + d3) % 32
        out.append(f"{words[d1]} {words[d2]} {words[d3]} {words[c]}")
    return out


@dataclass
class SynthCorpus:
    documents: pa.Table       # (doc_id, spans) — the pipeline input
    triples_ref: pa.Table     # ground truth (canonical subj, pred, obj, doc_id, weight)
    alias_groups: pa.Table    # canonical_id -> surface_forms (normalized)
    entity_types: Dict[str, str]  # canonical_id -> type
    mentions_ref: pa.Table = None    # (doc_id, entity_id) one row per mention
    assembled_ref: pa.Table = None   # (doc_id, text) span-assembled document text
    cluster_of: Dict[str, int] = None  # canonical_id -> planted community


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
             media_rate: float = 0.03,
             dup_rate: float = 0.0,
             name_mode: str = "separated",
             doc_locality: bool = False,
             intra_p: float = INTRA_P) -> SynthCorpus:
    """``dup_rate`` appends ``int(n_docs * dup_rate)`` EXACT-duplicate
    documents (copies of earlier docs under fresh doc_ids, media refs
    rewritten to the new doc). Duplicate docs share every chunk_id
    (chunk_id = sha1(text)) with their source — the collision case the
    work-dedup join and provenance bookkeeping must survive; ground-truth
    tables are duplicated alongside so the oracles stay exact."""
    rng = np.random.default_rng(seed)
    n_entities = n_entities or max(20, n_docs // 2)

    # --- closed world: canonical entities, pairwise edit distance > 8 (so
    # even two ≤2-edit typo variants of different entities stay > 4 apart —
    # the judge's <3 gate can never chain two distinct entities together) ---
    if name_mode == "structured":
        names: List[str] = _structured_names(n_entities, rng)
    else:
        names = []
        while len(names) < n_entities:
            cand = _make_name(rng)
            if all(edit_distance(cand.upper(), n.upper(), 8) > 8 for n in names):
                names.append(cand)
    types = {n: ENTITY_TYPES[_h("type|" + n) % len(ENTITY_TYPES)] for n in names}
    variants = {n: _variants(n, rng) for n in names}

    # --- fact universe: Zipf-weighted subjects for hot-key skew, with a
    # PLANTED community structure: entities live in contiguous clusters of
    # CLUSTER_SIZE; facts stay intra-cluster with probability INTRA_P, so the
    # canonical graph has a known modular ground truth that seeded community
    # detection must recover (the LFR-style planted-partition benchmark) ---
    preds = list(PRED_PHRASES)
    cluster_id = np.arange(n_entities) // CLUSTER_SIZE
    n_clusters = int(cluster_id.max()) + 1
    zipf_k = 1.0 / np.arange(1, CLUSTER_SIZE + 1, dtype=np.float64)
    zipf_k /= zipf_k.sum()

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

    def draw_cluster_zipf(size: int) -> np.ndarray:
        """Entity draw: uniform cluster, Zipf rank within the cluster."""
        cl = rng.integers(n_clusters, size=size)
        within = rng.choice(CLUSTER_SIZE, p=zipf_k, size=size)
        start = cl * CLUSTER_SIZE
        span = np.minimum(start + CLUSTER_SIZE, n_entities) - start
        return start + (within % span)

    if doc_locality:
        # realistic topical locality: all of a document's subjects come from
        # ONE cluster chosen per doc (a doc is "about" a topic), so a doc
        # delta touches O(delta) clusters — the sparse-vocabulary regime
        # where delta-scoped graph updates pay off; without it every fact
        # draws a uniform cluster and even a 1% doc delta touches nearly
        # every entity
        doc_cl = rng.integers(n_clusters, size=n_docs)
        fact_doc = np.repeat(np.arange(n_docs), n_facts_all)
        cl = doc_cl[fact_doc]
        within_s = rng.choice(CLUSTER_SIZE, p=zipf_k, size=total_facts)
        start_s = cl * CLUSTER_SIZE
        span_s = np.minimum(start_s + CLUSTER_SIZE, n_entities) - start_s
        si_all = start_s + (within_s % span_s)
    else:
        si_all = draw_cluster_zipf(total_facts)
    # objects: intra-cluster with prob INTRA_P (Zipf within the subject's
    # cluster), else an independent global draw (sparse inter-cluster noise)
    oi_global = draw_cluster_zipf(total_facts)
    within_o = rng.choice(CLUSTER_SIZE, p=zipf_k, size=total_facts)
    # intra_p=1.0 plants a DISCONNECTED graph (clusters = connected
    # components) — the per-component community carry-over regime
    intra_mask = rng.random(total_facts) < intra_p
    c_start = (si_all // CLUSTER_SIZE) * CLUSTER_SIZE
    c_size = np.minimum(c_start + CLUSTER_SIZE, n_entities) - c_start
    oi_intra = c_start + (within_o % c_size)
    oi_all = np.where(intra_mask, oi_intra, oi_global)
    pred_all = rng.integers(len(preds), size=total_facts)
    s_roll = rng.random(total_facts)
    o_roll = rng.random(total_facts)
    s_vari = rng.integers(0, 4, size=total_facts)  # modded by len(variants)
    o_vari = rng.integers(0, 4, size=total_facts)

    m_doc: List[str] = []
    m_ent: List[str] = []
    assembled: List[str] = []
    # per-entity observed-surface counts (normalized), to compute the SPEC's
    # canonical representative: the pipeline's documented rule is max mention
    # count, tie → lexicographic min (stages/canonicalize.py). Rare entities
    # can be observed only through a variant form — the representative is
    # then that variant, and the ground truth must say so too.
    obs: List[Dict[str, int]] = [dict() for _ in range(n_entities)]
    obs_log: Dict[str, List[tuple]] = {}  # doc_id -> (entity idx, norm surface)
    norm_memo: Dict[str, str] = {}

    def _norm(s: str) -> str:
        v = norm_memo.get(s)
        if v is None:
            v = normalize_surface(s)
            norm_memo[s] = v
        return v

    fact_idx = 0
    for d in range(n_docs):
        doc_id = f"doc-{d:08d}"
        sentences: List[str] = []
        n_facts = int(n_facts_all[d])
        for _ in range(n_facts):
            si = int(si_all[fact_idx])
            oi = int(oi_all[fact_idx])
            if oi == si:
                # deterministic shift that stays inside the subject's cluster
                cs = (si // CLUSTER_SIZE) * CLUSTER_SIZE
                size = min(cs + CLUSTER_SIZE, n_entities) - cs
                oi = cs + ((si - cs + 1) % size) if size > 1 else (si + 1) % n_entities
            s_name, o_name = names[si], names[oi]
            pred = preds[int(pred_all[fact_idx])]
            # base form strictly majority: 70% base, rest uniform over variants
            sv = variants[s_name]
            ov = variants[o_name]
            s_surf = s_name if s_roll[fact_idx] < 0.7 else sv[int(s_vari[fact_idx]) % len(sv)]
            o_surf = o_name if o_roll[fact_idx] < 0.7 else ov[int(o_vari[fact_idx]) % len(ov)]
            for idx, surf in ((si, s_surf), (oi, o_surf)):
                k = _norm(surf)
                obs[idx][k] = obs[idx].get(k, 0) + 1
                if dup_rate > 0:  # replayed for duplicate docs (rep rule
                    obs_log.setdefault(doc_id, []).append((idx, k))
            sentences.append(
                f"The {types[s_name]} {s_surf} {PRED_PHRASES[pred]} "
                f"the {types[o_name]} {o_surf}。"
            )
            t_subj.append(norm_names[si])
            t_pred.append(pred)
            t_obj.append(norm_names[oi])
            t_doc.append(doc_id)
            m_doc.extend((doc_id, doc_id))
            m_ent.extend((norm_names[si], norm_names[oi]))
            wk = (s_surf, pred, o_surf)
            w = weight_memo.get(wk)
            if w is None:
                w = weight_for(s_surf.upper(), pred, o_surf.upper())
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
        # independent span-assembly truth: text spans in offset order, joined
        # with "\n" (the span-sequence contract stages/chunker.py must honor)
        assembled.append("\n".join(
            sp["text"] for sp in spans if sp["kind"] == "text"))

    # exact-duplicate documents (see docstring): copy spans + truth rows
    n_dups = int(n_docs * dup_rate)
    if n_dups:
        by_doc_t: Dict[str, List[int]] = {}
        for i, d in enumerate(t_doc):
            by_doc_t.setdefault(d, []).append(i)
        by_doc_m: Dict[str, List[int]] = {}
        for i, d in enumerate(m_doc):
            by_doc_m.setdefault(d, []).append(i)
        src_idx = rng.integers(0, n_docs, size=n_dups)
        for j in range(n_dups):
            src = doc_ids[int(src_idx[j])]
            new_id = f"dup-{j:08d}"
            spans = []
            for s in spans_col[int(src_idx[j])]:
                s2 = dict(s)
                if s2["media_ref"]:
                    s2["media_ref"] = s2["media_ref"].replace(src, new_id, 1)
                spans.append(s2)
            doc_ids.append(new_id)
            spans_col.append(spans)
            assembled.append(assembled[int(src_idx[j])])
            for i in by_doc_t.get(src, []):
                t_subj.append(t_subj[i])
                t_pred.append(t_pred[i])
                t_obj.append(t_obj[i])
                t_doc.append(new_id)
                t_w.append(t_w[i])
            for i in by_doc_m.get(src, []):
                m_doc.append(new_id)
                m_ent.append(m_ent[i])
            for idx, k in obs_log.get(src, []):  # duplicates count toward
                obs[idx][k] = obs[idx].get(k, 0) + 1  # the representative rule

    documents = pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=S.DOCUMENTS
    )

    # canonical representative per entity under the SPEC rule (max observed
    # normalized-surface count, tie → lexicographic min) — computed from the
    # generator's own emission log, independent of the pipeline
    rep: List[str] = []
    for i in range(n_entities):
        if obs[i]:
            rep.append(sorted(obs[i].items(), key=lambda kv: (-kv[1], kv[0]))[0][0])
        else:
            rep.append(norm_names[i])
    base2rep = dict(zip(norm_names, rep))

    triples_ref = pa.table({
        "subj": pa.array([base2rep[s] for s in t_subj]),
        "pred": pa.array(t_pred),
        "obj": pa.array([base2rep[o] for o in t_obj]),
        "doc_id": pa.array(t_doc), "weight": pa.array(t_w, pa.float32()),
    })
    alias_groups = pa.table({
        "canonical_id": rep,
        "surface_forms": [
            sorted({normalize_surface(v) for v in variants[n]}) for n in names
        ],
    })
    return SynthCorpus(
        documents=documents,
        triples_ref=triples_ref,
        alias_groups=alias_groups,
        entity_types={rep[i]: types[names[i]] for i in range(n_entities)},
        mentions_ref=pa.table({
            "doc_id": pa.array(m_doc),
            "entity_id": pa.array([base2rep[e] for e in m_ent])}),
        assembled_ref=pa.table({
            "doc_id": pa.array(doc_ids), "text": pa.array(assembled)}),
        cluster_of={rep[i]: int(cluster_id[i]) for i in range(n_entities)},
    )


def write_corpus(corpus: SynthCorpus, out_dir: str, n_files: int = 1) -> None:
    """Persist the corpus as parquet. ``n_files > 1`` shards ``documents``
    into a DIRECTORY of contiguous row slices (still readable by
    ``read_parquet``/``pq.read_table`` at the same path) — a single parquet
    file arrives in Ray as ONE read task, which serializes the first ~1 s of
    every pipeline over the corpus; sharding makes the read itself parallel."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    docs = corpus.documents
    if n_files > 1 and docs.num_rows:
        n_files = min(n_files, docs.num_rows)
        shard_dir = f"{out_dir}/documents.parquet"
        os.makedirs(shard_dir, exist_ok=True)
        per = -(-docs.num_rows // n_files)
        for i in range(n_files):
            sl = docs.slice(i * per, per)
            if sl.num_rows:
                pq.write_table(sl, f"{shard_dir}/part-{i:04d}.parquet",
                               row_group_size=4096)
    else:
        pq.write_table(docs, f"{out_dir}/documents.parquet")
    pq.write_table(corpus.triples_ref, f"{out_dir}/triples_ref.parquet")
    pq.write_table(corpus.alias_groups, f"{out_dir}/alias_groups.parquet")
