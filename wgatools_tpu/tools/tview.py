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
        self.names = sorted(self.index.keys())
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

    def regions_for(self, name: str):
        item = self.index.get(name)
        if item is None:
            return []
        return [(iv["start"], iv["end"], iv["offset"]) for iv in item["ivls"]]

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
    """Interactive curses loop (reference event loop: tview.rs:369-440)."""
    import curses

    app = MafViewApp(input_path, step)

    def loop(stdscr):
        curses.curs_set(0)
        curses.use_default_colors()
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
                "←/→ scroll  g goto(name:pos)  q quit",
                w - 1,
                curses.A_REVERSE,
            )
            stdscr.refresh()
            key = stdscr.getch()
            if key in (ord("q"), 27):
                break
            elif key == curses.KEY_LEFT:
                app.scroll_left()
            elif key == curses.KEY_RIGHT:
                app.scroll_right()
            elif key == ord("g"):
                curses.echo()
                curses.curs_set(1)
                stdscr.addnstr(h - 1, 0, "goto> " + " " * (w - 8), w - 1)
                stdscr.move(h - 1, 6)
                try:
                    entry = stdscr.getstr(h - 1, 6, 64).decode("ascii")
                except Exception:
                    entry = ""
                curses.noecho()
                curses.curs_set(0)
                if ":" in entry:
                    name, _, pos = entry.rpartition(":")
                    try:
                        app.navigate(name, int(pos))
                    except ValueError:
                        pass

    curses.wrapper(loop)
