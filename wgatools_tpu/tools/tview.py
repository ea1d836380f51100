"""Terminal alignment viewer (reference: src/tools/tview.rs).

A curses TUI over an indexed MAF: sequence rows with per-base colors, a
target-coordinate axis with tick marks, horizontal scrolling, and a `g`
navigation prompt accepting `name:pos` validated against the index
intervals (reference behavior: tview.rs:168-326, 543-585).

The rendering/navigation core (MafViewApp) is pure and unit-testable; the
curses loop is a thin shell around it.
"""

import os

from ..errors import FileNotExist, WGAError
from ..io.maf import MafReader
from ..tools.index import index_path_for, load_index

# per-base display colors, cycling like the reference's 8-bit color table
# (tview.rs:23)
BASE_COLORS = {
    "A": 1,
    "C": 2,
    "G": 3,
    "T": 4,
    "N": 5,
    "-": 6,
}


NAV_PREFIX = "Goto: "
_NAV_RE = None


def _nav_regex():
    global _NAV_RE
    if _NAV_RE is None:
        import re

        # reference: tview.rs:595
        _NAV_RE = re.compile(r"^[a-zA-Z0-9.\-@_#]+:[0-9]+$")
    return _NAV_RE


class Navigation:
    """Navigation popup state: sequence-name list, per-name region list,
    editable `name:pos` input, interval validation
    (reference: tview.rs:41-166, 594-633).

    Pure (no terminal I/O) so every interaction is unit-testable; the
    curses shell renders `names`/`regions` lists with the current
    selections and the input line.
    """

    def __init__(self, index):
        self.show = False
        self.input = NAV_PREFIX
        self.cursor = len(NAV_PREFIX)
        self.input_valid = True
        self.names = list(index.keys())
        self.all_regions = [
            [(iv["start"], iv["end"], iv["offset"]) for iv in index[n]["ivls"]]
            for n in self.names
        ]
        self.select_name_idx = 0
        self.select_region_idx = 0
        self.select_region = False  # focused list: False=names, True=regions
        self.update_input()

    @property
    def regions(self):
        """Region display strings for the selected name ("start-end",
        the reference's ivvec2strvec)."""
        return [
            f"{s}-{e}" for s, e, _ in self.all_regions[self.select_name_idx]
        ]

    def _wrap(self, idx, delta, n):
        if n == 0:
            return 0
        return (idx + delta) % n

    def select_up(self):
        if not self.show:
            return
        if not self.select_region:
            self.select_name_idx = self._wrap(
                self.select_name_idx, -1, len(self.names)
            )
            self.select_region_idx = 0
        else:
            self.select_region_idx = self._wrap(
                self.select_region_idx, -1, len(self.regions)
            )
        self.update_input()

    def select_down(self):
        if not self.show:
            return
        if not self.select_region:
            self.select_name_idx = self._wrap(
                self.select_name_idx, 1, len(self.names)
            )
            self.select_region_idx = 0
        else:
            self.select_region_idx = self._wrap(
                self.select_region_idx, 1, len(self.regions)
            )
        self.update_input()

    def toggle_list(self):
        """Tab: switch focus between the name and region lists."""
        self.select_region = not self.select_region

    def update_input(self):
        """Fill the input from the selected name + region start
        (tview.rs:98-104)."""
        if not self.names:
            return
        name = self.names[self.select_name_idx]
        regions = self.regions
        start = (
            regions[self.select_region_idx].split("-")[0] if regions else "0"
        )
        self.input = f"{NAV_PREFIX}{name}:{start}"
        self.cursor = len(self.input)
        self.input_valid = True

    def move_cursor_left(self):
        self.cursor = max(len(NAV_PREFIX), self.cursor - 1)

    def move_cursor_right(self):
        self.cursor = min(len(self.input), self.cursor + 1)

    def enter_char(self, ch: str):
        self.input = self.input[: self.cursor] + ch + self.input[self.cursor :]
        self.cursor += 1

    def delete_char(self):
        if self.cursor > len(NAV_PREFIX):
            self.input = (
                self.input[: self.cursor - 1] + self.input[self.cursor :]
            )
            self.cursor -= 1

    def validate(self):
        """Validate the typed `name:pos` against the index intervals
        (tview.rs:594-633).  Returns (name, pos, offset) on success, sets
        input_valid False otherwise."""
        body = self.input[len(NAV_PREFIX) :]
        if not _nav_regex().match(body):
            self.input_valid = False
            return None
        name, _, raw_start = body.partition(":")
        if name not in self.names:
            self.input_valid = False
            return None
        try:
            pos = int(raw_start)
        except ValueError:
            self.input_valid = False
            return None
        for start, end, offset in self.all_regions[self.names.index(name)]:
            # interval containment like lapper.find(pos, pos+1)
            if start < pos + 1 and pos < end:
                self.input_valid = True
                return (name, pos, offset)
        self.input_valid = False
        return None


class MafViewApp:
    """Viewer state: current record, scroll position, navigation."""

    def __init__(self, input_path: str, step: int = 10):
        idx_path = index_path_for(input_path)
        if not os.path.exists(idx_path):
            raise FileNotExist(idx_path)
        self.index = load_index(idx_path)
        self.reader = MafReader.from_path(input_path)
        self.step = step
        self.scroll = 0
        self.record = None
        # (no app-level name list: navigation owns the popup's name
        # order, deliberately UNSORTED index order -- a sorted shadow
        # copy here invited wiring the popup to the wrong order)
        self.navigation = Navigation(self.index)
        # start at the first record (smallest offset in the index)
        first = min(
            (iv["offset"] for item in self.index.values() for iv in item["ivls"]),
            default=0,
        )
        self.load_at(first)

    def load_at(self, offset: int):
        self.reader.seek(offset)
        self.record = self.reader.next_record()
        if self.record is None:
            raise WGAError("no record at offset")
        self.scroll = 0

    @property
    def block_size(self) -> int:
        return len(self.record.slines[0].seq) if self.record else 0

    def scroll_left(self):
        self.scroll = max(0, self.scroll - self.step)

    def scroll_right(self):
        self.scroll = min(self.block_size, self.scroll + self.step)
        # reproduce the reference's u16 scroll cap (ratatui's scrollbar
        # state is u16, tview.rs:51-53): scrolling past 65535 is a hard
        # error steering users to `chunk`.  curses has no such limit --
        # kept for behavior parity, marked in PARITY.md.
        if self.scroll > 0xFFFF:
            raise WGAError(
                "scroll out of u16 range, This error is due to the "
                "scrolling limit of `ratatui`"
                "(https://github.com/ratatui-org/ratatui/issues/399). "
                "You can temporarily use the `chunk` subcommand to chunk "
                "it with a appropriate size (< 65535)."
            )

    def regions_for(self, name: str):
        item = self.index.get(name)
        if item is None:
            return []
        return [(iv["start"], iv["end"], iv["offset"]) for iv in item["ivls"]]

    def confirm_navigation(self) -> bool:
        """Enter in the popup: validate and jump (tview.rs:425-429).
        Closes the popup on success, keeps it open (input_valid=False
        shown) otherwise."""
        hit = self.navigation.validate()
        if hit is None:
            return False
        name, pos, _offset = hit
        if self.navigate(name, pos):
            self.navigation.show = False
            return True
        self.navigation.input_valid = False
        return False

    def navigate(self, name: str, pos: int) -> bool:
        """Jump to the record containing name:pos; True on success
        (tview.rs:266-326)."""
        for start, end, offset in self.regions_for(name):
            if start <= pos < end:
                self.load_at(offset)
                # scroll so that `pos` is at the window start: map the
                # region position to a column index on that s-line
                rec = self.record
                idx = rec.get_query_idx_byname(name)
                if idx is not None:
                    sline = rec.slines[idx]
                    self.scroll = sline.get_col_coord(pos - sline.start)
                return True
        return False

    def axis_line(self, width: int) -> str:
        """Target-coordinate axis with ticks every 10 columns
        (tview.rs:543-585)."""
        sline = self.record.slines[0]
        # absolute target coordinate of each visible column (gap-skipping)
        seq = sline.seq[self.scroll : self.scroll + width]
        out = []
        coord = sline.start
        # count non-gaps before scroll for the starting coordinate
        coord += sum(1 for c in sline.seq[: self.scroll] if c != ord("-"))
        col = 0
        while col < len(seq):
            if col % 10 == 0:
                label = str(coord + sum(1 for c in seq[:col] if c != ord("-")))
                tick = "|" + label
                out.append(tick[: max(1, min(len(tick), len(seq) - col))])
                col += len(tick)
            else:
                out.append(" ")
                col += 1
        return "".join(out)[:width]

    def visible_rows(self, width: int):
        """(name, sequence_slice) rows for the current window."""
        rows = []
        for sline in self.record.slines:
            seq = sline.seq[self.scroll : self.scroll + width].decode("ascii")
            rows.append((sline.name, seq))
        return rows


def tview(input_path: str, step: int = 10):
    """Interactive curses loop (reference event loop: tview.rs:369-440).

    Mirrors the reference's 250 ms tick: input is polled with a 250 ms
    timeout and the screen redraws every tick even without input
    (crossterm poll(tick_rate), tview.rs:373-379).  Terminal resizes
    (curses KEY_RESIZE) re-render at the new geometry; draws are guarded
    so a mid-resize too-small window never crashes the shell."""
    import curses

    app = MafViewApp(input_path, step)

    def loop(stdscr):
        curses.curs_set(0)
        stdscr.timeout(250)  # the 250 ms tick (tview.rs:361 tick_rate)
        try:
            # terminals without default-color support raise here; fall
            # back to monochrome instead of dying (round-5 review)
            curses.use_default_colors()
        except curses.error:
            pass
        if curses.has_colors():
            curses.start_color()
            for i, color in enumerate(
                [
                    curses.COLOR_GREEN,
                    curses.COLOR_CYAN,
                    curses.COLOR_YELLOW,
                    curses.COLOR_BLUE,
                    curses.COLOR_MAGENTA,
                    curses.COLOR_RED,
                ]
            ):
                curses.init_pair(i + 1, color, -1)
        while True:
            stdscr.erase()
            h, w = stdscr.getmaxyx()
            nav = app.navigation
            try:
                name_w = max(len(s.name) for s in app.record.slines) + 2
                seq_w = max(10, w - name_w - 1)
                stdscr.addnstr(0, name_w, app.axis_line(seq_w), seq_w)
                for row_i, (name, seq) in enumerate(app.visible_rows(seq_w)):
                    if row_i + 1 >= h - 1:
                        break
                    stdscr.addnstr(row_i + 1, 0, name, name_w - 1)
                    for ci, ch in enumerate(seq):
                        color = BASE_COLORS.get(ch.upper(), 0)
                        stdscr.addnstr(
                            row_i + 1,
                            name_w + ci,
                            ch,
                            1,
                            curses.color_pair(color),
                        )
                stdscr.addnstr(
                    h - 1,
                    0,
                    "←/→ scroll  g goto popup  q quit",
                    w - 1,
                    curses.A_REVERSE,
                )
                if nav.show:
                    _draw_nav_popup(stdscr, curses, nav, h, w)
            except curses.error:
                # mid-resize geometry can be transiently too small for a
                # full draw; the next tick re-renders cleanly
                pass
            stdscr.refresh()
            key = stdscr.getch()
            if key == -1:
                # 250 ms tick elapsed without input: redraw
                continue
            if key == curses.KEY_RESIZE:
                # re-render at the new geometry (getmaxyx re-reads it)
                continue
            if nav.show:
                # popup key routing (reference: tview.rs:381-430)
                if key == 27:  # Esc closes
                    nav.show = False
                elif key == curses.KEY_UP:
                    nav.select_up()
                elif key == curses.KEY_DOWN:
                    nav.select_down()
                elif key == curses.KEY_LEFT:
                    nav.move_cursor_left()
                elif key == curses.KEY_RIGHT:
                    nav.move_cursor_right()
                elif key == ord("\t"):
                    nav.toggle_list()
                elif key in (curses.KEY_BACKSPACE, 127, 8):
                    nav.delete_char()
                elif key in (curses.KEY_ENTER, ord("\n"), ord("\r")):
                    app.confirm_navigation()
                elif 32 <= key < 127:
                    nav.enter_char(chr(key))
                continue
            if key in (ord("q"), 27):
                break
            elif key == curses.KEY_LEFT:
                app.scroll_left()
            elif key == curses.KEY_RIGHT:
                app.scroll_right()
            elif key == ord("g"):
                nav.show = True
                nav.update_input()

    curses.wrapper(loop)


def _draw_nav_popup(stdscr, curses, nav, h, w):
    """Centered popup: name list + region list (selected rows
    highlighted), input line, validity message
    (reference layout: tview.rs:636-673)."""
    ph = max(8, min(h - 2, 14))
    pw = max(30, min(w - 4, 60))
    top = (h - ph) // 2
    left = (w - pw) // 2
    for row in range(ph):
        stdscr.addnstr(top + row, left, " " * pw, pw, curses.A_NORMAL)
    list_h = ph - 4
    half = pw // 2
    stdscr.addnstr(top, left, " seq name ".center(half, "-"), half)
    stdscr.addnstr(top, left + half, " region ".center(pw - half, "-"),
                   pw - half)

    def draw_list(items, sel, col, width, focused):
        first = max(0, sel - list_h + 1)
        for i, item in enumerate(items[first : first + list_h]):
            attr = curses.A_NORMAL
            if first + i == sel:
                attr = curses.A_REVERSE if focused else curses.A_BOLD
            prefix = ">> " if first + i == sel else "   "
            stdscr.addnstr(top + 1 + i, col, (prefix + item)[:width], width,
                           attr)

    draw_list(nav.names, nav.select_name_idx, left, half - 1,
              not nav.select_region)
    draw_list(nav.regions, nav.select_region_idx, left + half, pw - half,
              nav.select_region)
    stdscr.addnstr(top + ph - 3, left, "-" * pw, pw)
    stdscr.addnstr(top + ph - 2, left, nav.input[:pw], pw)
    msg = (
        "Tab: switch  Enter: go  Esc: close"
        if nav.input_valid
        else "invalid region!"
    )
    stdscr.addnstr(top + ph - 1, left, msg[:pw], pw,
                   curses.A_NORMAL if nav.input_valid else curses.A_REVERSE)
