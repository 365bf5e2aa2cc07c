"""GFA v1 parsing into a bidirected sequence graph.

Parses S (segment) and L (link) lines only, like the reference
(src/GfaGraph.cpp:220-293).  String node names are mapped to dense integer
ids; per-link overlaps are kept (a link `u o1 v o2 kM` means the last k
bases of the source orientation equal the first k bases of the target
orientation, so a path uses seq(u) + seq(v)[k:]).
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass, field
from typing import Dict, List, Tuple


@dataclass
class Bigraph:
    """Bidirected graph: one entry per GFA segment, links with orientations."""
    names: List[str] = field(default_factory=list)
    seqs: List[str] = field(default_factory=list)
    # (from_id, from_is_reverse, to_id, to_is_reverse, overlap_bp)
    links: List[Tuple[int, bool, int, bool, int]] = field(default_factory=list)
    name_to_id: Dict[str, int] = field(default_factory=dict)

    def add_segment(self, name: str, seq: str) -> int:
        if name in self.name_to_id:
            raise ValueError(f"duplicate GFA segment name: {name}")
        nid = len(self.names)
        self.name_to_id[name] = nid
        self.names.append(name)
        self.seqs.append(seq)
        return nid


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def parse_overlap(cigar: str) -> int:
    """Overlap in bases from a GFA link CIGAR.  Accepts '*', '0M', 'kM'."""
    cigar = cigar.strip()
    if cigar in ("*", ""):
        return 0
    if cigar.endswith("M"):
        try:
            return int(cigar[:-1])
        except ValueError:
            pass
    raise ValueError(f"unsupported GFA link overlap: {cigar!r}")


def load_gfa(path: str) -> Bigraph:
    g = Bigraph()
    pending_links: List[Tuple[str, bool, str, bool, int]] = []
    with _open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.rstrip("\r\n")
            if not line:
                continue
            parts = line.split("\t")
            if parts[0] == "S":
                if len(parts) < 3:
                    raise ValueError(f"{path}:{lineno}: malformed S line")
                g.add_segment(parts[1], parts[2].upper())
            elif parts[0] == "L":
                if len(parts) < 5:
                    raise ValueError(f"{path}:{lineno}: malformed L line")
                overlap = parse_overlap(parts[5]) if len(parts) > 5 else 0
                pending_links.append((parts[1], parts[2] == "-",
                                      parts[3], parts[4] == "-", overlap))
    for fn, frev, tn, trev, overlap in pending_links:
        if fn not in g.name_to_id or tn not in g.name_to_id:
            raise ValueError(f"GFA link references unknown segment: {fn}->{tn}")
        g.links.append((g.name_to_id[fn], frev, g.name_to_id[tn], trev,
                        overlap))
    return g
