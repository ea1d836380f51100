"""Rename MAF s-lines with positional prefixes (reference: src/tools/rename.rs)."""

from ..io.maf import MafWriter


def rename_maf(reader, writer, prefixes):
    maf_writer = MafWriter(writer)
    maf_writer.write_header(f"#maf version=1.6 rename={';'.join(prefixes)}")
    for rec in reader.records():
        rec.rename(prefixes)
        maf_writer.write_record(rec)
    writer.flush()
