"""Genome region parsing (reference: src/tools/mafextra.rs:78-135)."""

import re
from dataclasses import dataclass

from ..errors import ParseGenomeRegionError

_REGION_RE = re.compile(r"^([a-zA-Z0-9.@_#-]+):([0-9]+)-([0-9]+)$")


@dataclass
class GenomeRegion:
    name: str
    start: int
    end: int

    def __str__(self):
        return f"{self.name}:{self.start}-{self.end}"


def parse_region(s: str) -> GenomeRegion:
    m = _REGION_RE.match(s)
    if not m:
        raise ParseGenomeRegionError(
            f"Region `{s}` is match the format of `chr:start-end`"
        )
    start, end = int(m.group(2)), int(m.group(3))
    if start > end:
        raise ParseGenomeRegionError(
            f"Start `{start}` is larger than end `{end}`"
        )
    return GenomeRegion(m.group(1), start, end)


def read_region_file(stream) -> list:
    """BED-ish TSV: name, start, end per line."""
    regions = []
    for raw in stream:
        line = raw.decode("ascii", "replace").strip()
        if not line:
            continue
        fields = line.split("\t")
        if len(fields) < 3:
            raise ParseGenomeRegionError(f"bad region line `{line}`")
        # clean WGAError on non-numeric/negative coordinates (the
        # reference's csv/u64 deserialize wraps the parse error too;
        # round-5 review finding: int() raised a raw ValueError).
        # Rust u64 grammar: one optional leading '+', ASCII digits
        def _u64(s):
            d = s[1:] if s[:1] == "+" else s
            if not d.isascii() or not d.isdigit():
                raise ParseGenomeRegionError(f"bad region line `{line}`")
            return int(d)

        start, end = _u64(fields[1]), _u64(fields[2])
        if start > end:
            raise ParseGenomeRegionError(
                f"Start `{start}` is larger than end `{end}`"
            )
        regions.append(GenomeRegion(fields[0], start, end))
    return regions
