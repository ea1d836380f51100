"""MAF byte-offset index (reference: src/tools/index.rs).

The index maps each sequence name to its intervals with the byte offset of
the enclosing record, enabling O(1) random access for maf-ext / tview and
acting as the shard manifest for distributed runs (each host claims
(sequence, offset-range) work units).

JSON layout matches the reference's serde output:
  {name: {"ivls": [{"start","end","strand","offset"}...], "size", "isref"}}
"""

import json

from ..errors import DuplicateName, EmptyRecord, WGAError


def build_index(mafreader, idx_writer):
    """Scan records, recording the byte offset before each
    (reference: index.rs:14-76)."""
    idx = {}
    while True:
        offset = mafreader.offset()
        rec = mafreader.next_record()
        if rec is None:
            break
        seen = set()
        for ord_, sline in enumerate(rec.slines):
            name = sline.name
            if name in seen:
                raise DuplicateName(name)
            seen.add(name)
            isref = ord_ == 0
            item = idx.get(name)
            if item is None:
                item = {"ivls": [], "size": sline.size, "isref": isref}
                idx[name] = item
            elif item["isref"] != isref:
                raise WGAError(
                    "Same sequence cannot be both reference and query!"
                )
            item["ivls"].append(
                {
                    "start": sline.start,
                    "end": sline.start + sline.align_size,
                    "strand": sline.strand,
                    "offset": offset,
                }
            )
    if not idx:
        raise EmptyRecord()
    idx_writer.write(json.dumps(idx, separators=(",", ":")).encode("ascii"))
    idx_writer.flush()


def load_index(path: str):
    with open(path, "rb") as fp:
        return json.load(fp)


def index_path_for(input_path: str) -> str:
    return input_path + ".index"
