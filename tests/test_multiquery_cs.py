"""Multi-query MAF blocks, query selection, and cs:Z: tag handling."""

import io
import re

import pytest

MULTI_MAF = (
    "#maf version=1.6\n"
    "a score=0\n"
    "s\tref.chr1\t10\t8\t+\t100\tACGTAC-T\n"
    "s\thg002#1#chr1\t0\t7\t+\t50\tACG-ACGT\n"
    "s\thg003#1#chr1\t5\t8\t-\t60\tACTTACGT\n"
    "\n"
)


def _reader():
    from wgatools_tpu.io.maf import MafReader

    return MafReader(io.BytesIO(MULTI_MAF.encode()))


def test_default_query_is_second_sline():
    rec = next(_reader().records())
    assert rec.query_name == "hg002#1#chr1"
    assert rec.query_start == 0
    assert rec.query_end == 7


def test_query_by_name_and_negative_coords():
    rec = next(_reader().records())
    rec.set_query_idx_byname("hg003#1#chr1")
    # negative strand: start = size - start - align_size = 60-5-8 = 47
    assert rec.query_start == 47
    assert rec.query_end == 55
    assert rec.is_negative


def test_query_regex_selection():
    rec = next(_reader().records())
    regex = re.compile(r"^hg003#.*$")
    rec.set_query_idx_by_regex(regex)
    assert rec.query_name == "hg003#1#chr1"

    from wgatools_tpu.errors import QueryNameNotFound

    with pytest.raises(QueryNameNotFound):
        rec.set_query_idx_by_regex(re.compile(r"^nope$"))


def test_maf2paf_with_query_name():
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.tools.convert import maf2paf

    out = io.BytesIO()
    maf2paf(
        MafReader(io.BytesIO(MULTI_MAF.encode())), out, "hg003#1#chr1"
    )
    fields = out.getvalue().decode().split("\t")
    assert fields[0] == "hg003#1#chr1"
    assert fields[4] == "-"
    # negative strand routes indels to inv counters: NM excludes nothing
    # here but strand must flow through
    assert fields[5] == "ref.chr1"


def test_maf2paf_unknown_query_errors():
    from wgatools_tpu.errors import QueryNameNotFound
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.tools.convert import maf2paf

    with pytest.raises(QueryNameNotFound):
        maf2paf(MafReader(io.BytesIO(MULTI_MAF.encode())), io.BytesIO(), "zz")


def test_call_skips_single_sline_records():
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.tools.caller import call_var_maf

    maf = (
        "#maf version=1.6\n"
        "a score=0\n"
        "s\tref.chr1\t0\t4\t+\t100\tACGT\n"
        "\n"
    )
    out = io.BytesIO()
    call_var_maf(
        MafReader(io.BytesIO(maf.encode())), None, out, True, False, 0
    )
    body = [
        l
        for l in out.getvalue().decode().splitlines()
        if not l.startswith("#")
    ]
    assert body == []


def test_cs_tag_to_cigar():
    from wgatools_tpu.io.paf import PafRecord, cs_to_cigar

    # example from the reference docstring (paf.rs:154-158)
    assert cs_to_cigar(":6-ata:10+gtc:4*at*tg:3") == "6M3D10M3I4M2X3M"

    # a record with only a cs tag gets a converted cg
    rec = PafRecord(tags=["cs:Z::6-ata:10+gtc:4*at*tg:3"])
    assert rec.get_cigar_string() == "cg:Z:6M3D10M3I4M2X3M"

    from wgatools_tpu.errors import CigarTagNotFound

    with pytest.raises(CigarTagNotFound):
        PafRecord(tags=["xx:i:1"]).get_cigar_string()


def test_cg_tag_preferred_over_cs():
    from wgatools_tpu.io.paf import PafRecord

    rec = PafRecord(tags=["cs:Z::5", "cg:Z:9M"])
    assert rec.get_cigar_string() == "cg:Z:9M"
