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


class TestNavigationPopup:
    """Navigation popup core (reference: tview.rs:41-166, 594-633)."""

    def _multi_maf(self, tmp_path):
        from wgatools_tpu.io.maf import MafReader
        from wgatools_tpu.tools.index import build_index

        src = open(fixture_path("test.maf"), "rb").read()
        header, _, body = src.partition(b"\n")
        # second record with different names so the name list has entries
        body2 = body.replace(b"ref.chr8", b"ref.chr9").replace(
            b"query.chr8", b"query.chr9"
        )
        maf = tmp_path / "multi.maf"
        maf.write_bytes(header + b"\n" + body + body2)
        with open(str(maf) + ".index", "wb") as out:
            build_index(MafReader.from_path(str(maf)), out)
        return str(maf)

    def test_popup_lists_and_selection(self, tmp_path):
        from wgatools_tpu.tools.tview import MafViewApp

        app = MafViewApp(self._multi_maf(tmp_path), step=10)
        nav = app.navigation
        nav.show = True
        assert len(nav.names) == 4  # 2 refs + 2 queries
        assert nav.regions  # region list for the first name
        first_input = nav.input
        assert first_input.startswith("Goto: ")
        # down moves the name selection and refreshes the regions + input
        nav.select_down()
        assert nav.select_name_idx == 1
        assert nav.input != first_input
        # wrap-around
        for _ in range(len(nav.names)):
            nav.select_down()
        assert nav.select_name_idx == 1
        # tab switches to the region list
        nav.toggle_list()
        nav.select_down()
        assert nav.select_region

    def test_popup_validation_and_jump(self, tmp_path):
        from wgatools_tpu.tools.tview import MafViewApp, NAV_PREFIX

        app = MafViewApp(self._multi_maf(tmp_path), step=10)
        nav = app.navigation
        nav.show = True
        # select the chr9 ref name and confirm -> app lands on record 2
        idx = nav.names.index("ref.chr9")
        while nav.select_name_idx != idx:
            nav.select_down()
        assert app.confirm_navigation()
        assert not nav.show
        assert app.record.slines[0].name == "ref.chr9"

        # invalid: garbage input
        nav.show = True
        nav.input = NAV_PREFIX + "nope:123"
        assert not app.confirm_navigation()
        assert not nav.input_valid
        # invalid: out-of-interval position
        nav.input = NAV_PREFIX + "ref.chr9:1"
        assert not app.confirm_navigation()
        assert not nav.input_valid
        # char editing round-trip
        nav.update_input()
        n0 = nav.input
        nav.enter_char("9")
        nav.delete_char()
        assert nav.input == n0

    def test_popup_pty_end_to_end(self, tmp_path):
        """Drive the real curses TUI through a pty: open the popup with
        `g`, pick the second name, Enter, then quit; the screen must have
        shown the popup and the app must exit cleanly."""
        import os
        import pty
        import select
        import subprocess
        import sys

        maf = self._multi_maf(tmp_path)
        script = (
            "import sys;"
            "from wgatools_tpu.tools.tview import tview;"
            f"tview({maf!r}, 10)"
        )
        master, slave = pty.openpty()
        env = dict(os.environ, TERM="xterm-256color", LINES="24", COLUMNS="100")
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdin=slave,
            stdout=slave,
            stderr=subprocess.PIPE,
            env=env,
        )
        os.close(slave)
        screen = b""

        def pump(pattern=None, timeout=30.0):
            """Read pty output until `pattern` appears in the accumulated
            screen (or, with no pattern, until output goes quiet).  A
            fixed quiet-gap heuristic alone is flaky under load -- the
            subprocess may take seconds to import and render."""
            nonlocal screen
            import time

            end = time.time() + timeout
            while time.time() < end:
                if pattern is not None and pattern in screen:
                    return True
                r, _, _ = select.select([master], [], [], 0.1)
                if r:
                    try:
                        data = os.read(master, 65536)
                    except OSError:
                        break
                    if not data:
                        break
                    screen += data
                elif pattern is None and screen:
                    return True
            return pattern is None or pattern in screen

        pump(b"ref.chr8")  # initial render shows the first target name
        os.write(master, b"g")  # open popup
        assert pump(b"Goto: "), screen[-2000:]
        assert b"seq name" in screen and b"region" in screen
        os.write(master, b"\x1b[B")  # Down: second name
        pump()
        os.write(master, b"\r")  # Enter: jump
        pump()
        os.write(master, b"q")  # quit
        try:
            err = proc.communicate(timeout=10)[1]
        except subprocess.TimeoutExpired:
            proc.kill()
            raise AssertionError("tview did not exit after q")
        finally:
            os.close(master)
        assert proc.returncode == 0, err.decode()
        # the popup listed our sequence names
        assert b"ref.chr9" in screen


class TestTviewShellFidelity:
    """Round-2 VERDICT #10: the 250 ms tick loop and the reference's u16
    scroll cap (tview.rs:369-440, 51-53), plus resize coverage."""

    def test_scroll_right_u16_cap_reproduced(self, tmp_path):
        """Scrolling past 65535 raises the reference's ratatui-limit
        error (tview.rs:51-53) even though curses has no such limit."""
        import numpy as np

        from wgatools_tpu.errors import WGAError
        from wgatools_tpu.io.maf import MafReader
        from wgatools_tpu.tools.index import build_index
        from wgatools_tpu.tools.tview import MafViewApp

        cols = 70_000
        seq = b"A" * cols
        maf = tmp_path / "wide.maf"
        maf.write_bytes(
            b"##maf version=1.6\na score=0\n"
            + b"s\tref.chr1\t0\t%d\t+\t%d\t" % (cols, cols) + seq + b"\n"
            + b"s\tq.chr1\t0\t%d\t+\t%d\t" % (cols, cols) + seq + b"\n\n"
        )
        with open(str(maf) + ".index", "wb") as out:
            build_index(MafReader.from_path(str(maf)), out)
        app = MafViewApp(str(maf), step=30_000)
        app.scroll_right()  # 30000
        app.scroll_right()  # 60000
        with pytest.raises(WGAError, match="u16 range"):
            app.scroll_right()  # 70000 > 65535 -> reference error
        # and the step default cannot trip it on u16-sized blocks
        app.scroll = 65_530
        app.step = 5
        app.scroll_right()
        assert app.scroll == 65_535

    def test_pty_tick_and_resize(self, tmp_path):
        """The shell redraws on the 250 ms tick without input, survives a
        pty resize (SIGWINCH/KEY_RESIZE), and still quits cleanly."""
        import fcntl
        import pty
        import select
        import signal
        import struct
        import subprocess
        import sys
        import termios
        import time

        from wgatools_tpu.io.maf import MafReader
        from wgatools_tpu.tools.index import build_index

        maf = tmp_path / "t.maf"
        shutil.copy(fixture_path("test.maf"), maf)
        with open(str(maf) + ".index", "wb") as out:
            build_index(MafReader.from_path(str(maf)), out)

        script = (
            "import sys;"
            "from wgatools_tpu.tools.tview import tview;"
            f"tview({str(maf)!r}, 10)"
        )
        master, slave = pty.openpty()
        fcntl.ioctl(
            slave, termios.TIOCSWINSZ, struct.pack("HHHH", 24, 100, 0, 0)
        )
        env = dict(os.environ, TERM="xterm-256color")
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdin=slave,
            stdout=slave,
            stderr=subprocess.PIPE,
            env=env,
        )
        os.close(slave)
        screen = b""

        def pump(pattern=None, timeout=30.0):
            nonlocal screen
            end = time.time() + timeout
            while time.time() < end:
                if pattern is not None and pattern in screen:
                    return True
                r, _, _ = select.select([master], [], [], 0.1)
                if r:
                    try:
                        data = os.read(master, 65536)
                    except OSError:
                        break
                    if not data:
                        break
                    screen += data
                elif pattern is None and screen:
                    return True
            return pattern is None or pattern in screen

        assert pump(b"ref.chr8"), screen[-800:]
        # tick: with NO input, the shell keeps polling (it must not block
        # forever in getch) -- prove liveness by the resize below being
        # handled without any prior keypress
        screen = b""
        fcntl.ioctl(
            master, termios.TIOCSWINSZ, struct.pack("HHHH", 30, 60, 0, 0)
        )
        proc.send_signal(signal.SIGWINCH)
        assert pump(b"ref.chr8", timeout=10), (
            b"no redraw after resize: " + screen[-800:]
        )
        # shrink to a tiny window: guarded draws must not crash
        fcntl.ioctl(
            master, termios.TIOCSWINSZ, struct.pack("HHHH", 3, 12, 0, 0)
        )
        proc.send_signal(signal.SIGWINCH)
        time.sleep(0.6)
        assert proc.poll() is None, proc.communicate()[1].decode()
        # restore and scroll once, then quit
        fcntl.ioctl(
            master, termios.TIOCSWINSZ, struct.pack("HHHH", 24, 100, 0, 0)
        )
        proc.send_signal(signal.SIGWINCH)
        pump()
        os.write(master, b"\x1b[C")  # Right
        pump()
        os.write(master, b"q")
        try:
            err = proc.communicate(timeout=10)[1]
        except subprocess.TimeoutExpired:
            proc.kill()
            raise AssertionError("tview did not exit after q")
        finally:
            os.close(master)
        assert proc.returncode == 0, err.decode()
