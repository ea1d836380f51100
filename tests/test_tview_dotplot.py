"""Tests for the tview core and dotplot output."""

import io
import json
import os
import shutil

import pytest

from conftest import fixture_path


@pytest.fixture
def indexed_maf(tmp_path):
    from wgatools_tpu.io.maf import MafReader
    from wgatools_tpu.tools.index import build_index

    maf = tmp_path / "t.maf"
    shutil.copy(fixture_path("test.maf"), maf)
    with open(str(maf) + ".index", "wb") as out:
        build_index(MafReader.from_path(str(maf)), out)
    return str(maf)


class TestTview:
    def test_app_loads_and_scrolls(self, indexed_maf):
        from wgatools_tpu.tools.tview import MafViewApp

        app = MafViewApp(indexed_maf, step=10)
        assert app.record is not None
        assert app.record.target_name == "ref.chr8"
        assert app.block_size == 1008
        app.scroll_right()
        assert app.scroll == 10
        app.scroll_left()
        assert app.scroll == 0
        # scroll clamps at block size
        for _ in range(200):
            app.scroll_right()
        assert app.scroll == 1008

    def test_rows_and_axis(self, indexed_maf):
        from wgatools_tpu.tools.tview import MafViewApp

        app = MafViewApp(indexed_maf, step=10)
        rows = app.visible_rows(40)
        assert rows[0][0] == "ref.chr8"
        assert rows[1][0] == "query.chr8"
        assert len(rows[0][1]) == 40
        axis = app.axis_line(40)
        assert "181469925" in axis

    def test_navigate(self, indexed_maf):
        from wgatools_tpu.tools.tview import MafViewApp

        app = MafViewApp(indexed_maf, step=10)
        assert app.navigate("ref.chr8", 181470000)
        assert app.scroll == 75  # 75 non-gap bases into the block
        assert not app.navigate("ref.chr8", 1)  # outside any interval
        assert not app.navigate("nope", 5)

    def test_missing_index_raises(self, tmp_path):
        from wgatools_tpu.errors import FileNotExist
        from wgatools_tpu.tools.tview import MafViewApp

        maf = tmp_path / "x.maf"
        shutil.copy(fixture_path("test.maf"), maf)
        with pytest.raises(FileNotExist):
            MafViewApp(str(maf))


class TestDotplot:
    def run_dotplot(self, path, **kw):
        from wgatools_tpu.tools.dotplot import dotplot

        out = io.BytesIO()
        dotplot(path, out, **kw)
        return out.getvalue()

    def test_base_level_matches_reference_html(self):
        """Data values must match the reference's committed test.html
        (generated with cutoff 0 from testdotplot.paf record 1)."""
        got = self.run_dotplot(
            fixture_path("testdotplot.paf"),
            format="paf",
            out_format="json",
            skip_cutoff=0,
        )
        spec = json.loads(got)
        with open(fixture_path("test.html")) as fp:
            html = fp.read()
        start = html.index('"values":[')
        depth = 0
        for i in range(start + len('"values":'), len(html)):
            if html[i] == "[":
                depth += 1
            elif html[i] == "]":
                depth -= 1
                if depth == 0:
                    end = i + 1
                    break
        ref_values = json.loads(html[start + len('"values":') : end])
        # reference html holds record 1 only; compare that prefix
        assert spec["data"]["values"][: len(ref_values)] == ref_values

    def test_default_cutoff_merges(self):
        got = self.run_dotplot(
            fixture_path("testdotplot.paf"), format="paf", out_format="csv"
        )
        lines = got.decode().splitlines()
        assert lines[0].startswith("ref_start,")
        # all indels < 50 merged: record 1 collapses to one M segment
        assert lines[1] == "0,200,0,200,M,B,A"
        # negative strand record: query start/end swapped
        assert lines[2] == "200,250,250,200,M,B,A"

    def test_overview(self):
        got = self.run_dotplot(
            fixture_path("test.maf"), mode="overview", out_format="csv"
        )
        lines = got.decode().splitlines()
        assert lines[1].split(",")[4] == "0.99"

    def test_color_config(self):
        from wgatools_tpu.errors import WGAError
        from wgatools_tpu.tools.dotplot import parse_color_config

        cm = parse_color_config("M:#FF0000,I:#00FF00")
        assert cm == {"M": "#FF0000", "I": "#00FF00"}
        with pytest.raises(WGAError):
            parse_color_config("M:red")
        with pytest.raises(WGAError):
            parse_color_config("M#FF0000")
