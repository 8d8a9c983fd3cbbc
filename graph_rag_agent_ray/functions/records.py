"""The delimited extraction-record contract.

This is the semantic heart of extraction parity: the reference's LLM emits
``("entity" : NAME : TYPE : DESC)`` and
``("relationship" : SRC : TGT : TYPE : DESC : WEIGHT)`` records
(prompt contract /root/reference/config/prompt.py:9,17; delimiters
graph/extraction/entity_extractor.py:44-46) and parses them with two regexes
(graph/extraction/graph_writer.py:48-49). We replicate BOTH directions:
``format_*`` produces the exact wire format (used by the mock extractor) and
``parse_records`` applies the exact regex contract including its error
semantics:

- records that don't match either regex are silently dropped;
- a relationship endpoint with no entity record is synthesized with
  type="未知", description="No additional data" (graph_writer.py:76-98);
- a malformed weight aborts the whole chunk and yields an EMPTY result
  rather than raising (graph_writer.py:111-121) — the ``float(weight)``
  call sits inside the try block, so one bad weight drops every
  already-parsed record of that chunk.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

# exact regexes from /root/reference/graph/extraction/graph_writer.py:48-49
NODE_PATTERN = re.compile(r'\("entity" : "(.+?)" : "(.+?)" : "(.+?)"\)')
REL_PATTERN = re.compile(r'\("relationship" : "(.+?)" : "(.+?)" : "(.+?)" : "(.+?)" : (.+?)\)')

TUPLE_DELIM = " : "
RECORD_DELIM = "\n"
COMPLETION_DELIM = "\n\n"

UNKNOWN_TYPE = "未知"
UNKNOWN_DESC = "No additional data"


def format_entity(name: str, etype: str, desc: str) -> str:
    return f'("entity" : "{name}" : "{etype}" : "{desc}")'


def format_relationship(src: str, tgt: str, rtype: str, desc: str, weight: float) -> str:
    w = int(weight) if float(weight).is_integer() else weight
    return f'("relationship" : "{src}" : "{tgt}" : "{rtype}" : "{desc}" : {w})'


@dataclass
class ParsedChunk:
    entities: List[Tuple[str, str, str]] = field(default_factory=list)       # (name, type, desc)
    relationships: List[Tuple[str, str, str, str, float]] = field(default_factory=list)
    error: str = ""


def parse_records(raw: str) -> ParsedChunk:
    """Parse one chunk's raw extraction text per the reference contract."""
    nodes: Dict[str, Tuple[str, str, str]] = {}
    rels: List[Tuple[str, str, str, str, float]] = []
    try:
        for name, etype, desc in NODE_PATTERN.findall(raw):
            if name not in nodes:
                nodes[name] = (name, etype, desc)
        for src, tgt, rtype, desc, weight in REL_PATTERN.findall(raw):
            if src not in nodes:
                nodes[src] = (src, UNKNOWN_TYPE, UNKNOWN_DESC)
            if tgt not in nodes:
                nodes[tgt] = (tgt, UNKNOWN_TYPE, UNKNOWN_DESC)
            rels.append((src, tgt, rtype, desc, float(weight)))
    except Exception as e:  # noqa: BLE001 — mirror graph_writer.py:111-121
        return ParsedChunk(entities=[], relationships=[], error=str(e))
    return ParsedChunk(entities=list(nodes.values()), relationships=rels)
