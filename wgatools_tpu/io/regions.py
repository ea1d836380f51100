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
        # round-5 review finding: int() raised a raw ValueError)
        if not (fields[1].isascii() and fields[1].isdigit()) or not (
            fields[2].isascii() and fields[2].isdigit()
        ):
            raise ParseGenomeRegionError(f"bad region line `{line}`")
        start, end = int(fields[1]), int(fields[2])
        if start > end:
            raise ParseGenomeRegionError(
                f"Start `{start}` is larger than end `{end}`"
            )
        regions.append(GenomeRegion(fields[0], start, end))
    return regions
