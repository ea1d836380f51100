"""Command-line interface mirroring the wgatools surface
(reference: src/cli.rs, src/main.rs).

Same subcommand names, visible aliases, and global flags
(-o/--outfile, -r/--rewrite, -t/--threads, -v), so wgatools invocations
translate 1:1 to `wgatools-tpu`.
"""

import argparse
import logging
import re
import sys

from . import __version__
from .errors import WGAError
from .log import init_logger

log = logging.getLogger("wgatools_tpu")


def _u64(s):
    """u64-typed flag values (clap rejects negatives for u64/usize
    fields; a negative chunk length would loop forever -- round-5
    review finding)."""
    import argparse

    try:
        v = int(s)
    except ValueError:
        raise argparse.ArgumentTypeError(f"`{s}` is not an integer")
    if v < 0:
        raise argparse.ArgumentTypeError(
            f"`{s}` is negative (u64 in wgatools)"
        )
    return v


def _add_global_flags(p, skip_shorts=()):
    """Global flags on one subparser (clap `global = true`, cli.rs:20-36).

    skip_shorts: shorts shadowed by a subcommand-local flag, exactly as
    clap resolves them -- chain2maf's `-t target` (cli.rs:86-88) and
    maf-ext's `-r regions` (cli.rs:114-117) win over the global
    -t/--threads and -r/--rewrite, which stay reachable long-form."""

    def flag(short, *names, **kw):
        if short.lstrip("-") in skip_shorts:
            p.add_argument(*names, **kw)
        else:
            p.add_argument(short, *names, **kw)

    flag(
        "-o",
        "--outfile",
        default="-",
        help='Output file ("-" for stdout), names ending in .gz/.bz2/.xz '
        "are compressed automatically",
    )
    flag(
        "-r",
        "--rewrite",
        action="store_true",
        help="Bool, if rewrite output file [default: false]",
    )
    flag("-t", "--threads", type=_u64, default=1, help="Threads, default 1")
    flag(
        "-v",
        "--verbose",
        action="count",
        default=0,
        help="Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]",
    )


def _wrap_regex_full_match(s: str):
    """Regexes are wrapped to full-match (reference: cli.rs:332-343)."""
    pattern = s
    if not pattern.startswith("^"):
        pattern = "^" + pattern
    if not pattern.endswith("$"):
        pattern = pattern + "$"
    return re.compile(pattern)


def build_parser():
    parser = argparse.ArgumentParser(
        prog="wgatools-tpu",
        description="a TPU-native toolkit for Whole Genome Alignment Files "
        "manipulation",
    )
    parser.add_argument("--version", action="version", version=__version__)
    sub = parser.add_subparsers(dest="command", required=True)

    def cmd(name, aliases, help_, skip_shorts=()):
        p = sub.add_parser(name, aliases=aliases, help=help_)
        _add_global_flags(p, skip_shorts)
        return p

    p = cmd("maf2paf", ["m2p"], "Convert MAF format to PAF format")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-q", "--query-name", "--query_name",
                   dest="query_name", default=None)

    p = cmd("maf2chain", ["m2c"], "Convert MAF format to Chain format")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-q", "--query-name", "--query_name",
                   dest="query_name", default=None)

    p = cmd("paf2maf", ["p2m"], "Convert PAF format to MAF format")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-g", "--target", required=True)
    p.add_argument("-q", "--query", required=True)

    p = cmd("paf2chain", ["p2c"], "Convert PAF format to Chain format")
    p.add_argument("input", nargs="?", default=None)

    p = cmd(
        "chain2maf",
        ["c2m"],
        "Convert Chain format to MAF format",
        skip_shorts=("t",),
    )
    p.add_argument("input", nargs="?", default=None)
    # -t shadows the global --threads here, as clap does (cli.rs:86-88);
    # -g kept as a compatibility alias from earlier releases
    p.add_argument("-t", "-g", "--target", required=True)
    p.add_argument("-q", "--query", required=True)

    p = cmd("chain2paf", ["c2p"], "Convert Chain format to PAF format")
    p.add_argument("input", nargs="?", default=None)

    p = cmd("maf-index", ["mi"], "Build index for MAF file")
    p.add_argument("input")

    p = cmd(
        "maf-ext",
        ["me"],
        "Extract specific region from MAF file with index",
        skip_shorts=("r",),
    )
    p.add_argument("input", nargs="?", default=None)
    # -r shadows the global --rewrite here, as clap does (cli.rs:114-117,
    # comma-delimited); -R kept as a compatibility alias
    p.add_argument("-r", "-R", "--regions", default=None)
    p.add_argument("-f", "--file", default=None)

    p = cmd("chunk", ["ch"], "Chunk MAF file by length")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-l", "--length", type=_u64, required=True)

    p = cmd("call", ["c"], "Call Variants from MAF/PAF file")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-n", "--sample", default="sample")
    p.add_argument("-s", "--snp", action="store_true")
    p.add_argument("-i", "--inv", action="store_true")
    p.add_argument("-l", "--svlen", type=_u64, default=50)
    p.add_argument("-f", "--format", choices=["maf", "paf"], default="maf")
    p.add_argument("--target", default=None)
    p.add_argument("-q", "--query", default=None)
    p.add_argument("--query-name", "--query_name", dest="query_name",
                   default=None)
    p.add_argument("--query-regex", dest="query_regex", default=None)
    p.add_argument("-c", "--chunk-size", "--chunk_size",
                   dest="chunk_size", type=_u64, default=1000000)

    p = cmd("tview", ["tv"], "View MAF file in terminal")
    p.add_argument("input")
    p.add_argument("-s", "--step", type=_u64, default=10)

    p = cmd("stat", ["st"], "Statistics for Alignment file")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-f", "--format", choices=["maf", "paf"], default="maf")
    p.add_argument("-e", "--each", action="store_true")
    p.add_argument("-q", "--query-name", "--query_name",
                   dest="query_name", default=None)

    p = cmd("dotplot", ["dp"], "Plot dotplot for Alignment file")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument(
        "-f", "--format", choices=["maf", "paf"], default="maf"
    )
    p.add_argument(
        "--out-format", "--out_format", dest="out_format",
        choices=["html", "json", "csv"], default="html"
    )
    p.add_argument(
        "-m",
        "--mode",
        choices=["base-level", "overview"],
        default="base-level",
    )
    p.add_argument("-d", "--no-identity", "--no_identity",
                   dest="no_identity", action="store_true")
    p.add_argument("-l", "--length", type=_u64, default=None)
    p.add_argument("-q", "--query-name", "--query_name",
                   dest="query_name", default=None)
    p.add_argument("--color", default=None)

    p = cmd("filter", ["fl"], "Filter records for Alignment file")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument(
        "-f", "--format", choices=["maf", "paf", "chain"], default="maf"
    )
    p.add_argument("-b", "--min-block-size", "--min_block_size",
                   dest="min_block_size", type=_u64, default=0)
    p.add_argument("-q", "--min-query-size", "--min_query_size",
                   dest="min_query_size", type=_u64, default=0)
    p.add_argument("-a", "--min-align-size", "--min_align_size",
                   dest="min_align_size", type=_u64, default=None)

    p = cmd("rename", ["rn"], "Rename MAF records with prefix")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-p", "--prefixs", required=True)

    p = cmd("maf2sam", ["m2s"], "DEV: maf2sam")
    p.add_argument("input", nargs="?", default=None)
    # EXTRA beyond the reference's stub: a working MAF -> SAM conversion
    # (the reference ignores the input and prints a noodles example,
    # converter.rs:94-125; see PARITY.md)
    p.add_argument("--real", action="store_true")

    p = cmd("pafcov", ["pc"], "Calculate coverage for PAF file")
    p.add_argument("input", nargs="?", default=None)

    p = cmd(
        "pafpseudo",
        ["pp"],
        "Generate pesudo-maf for divergence analysis from PAF file",
    )
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-f", "--fasta", default=None)
    p.add_argument("-g", "--target", default=None)

    p = cmd("gen-completion", ["gc"], "Generate completion script for shell")
    p.add_argument("-s", "--shell", required=True, choices=["bash", "zsh", "fish"])

    p = cmd(
        "validate",
        ["vf"],
        "Validate and fix query&target position in PAF file by CIGAR",
    )
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-f", "--fix", default=None)

    # OPTIONAL EXTRA (not reference parity): pileup exists in the
    # reference only as dead code (tools/pileup.rs never compiled,
    # CLI entry commented out at cli.rs:315-324) -- this is a working
    # equivalent with deterministic output; see tools/pileup.py +
    # PARITY.md
    p = cmd("pileup", ["pl"], "EXTRA: merged MAF pileup (dead code in wgatools)")
    p.add_argument("input", nargs="?", default=None)
    p.add_argument("-a", "--all", action="store_true", dest="all_sites")

    # OPTIONAL EXTRA: trimovp is dead code too (tools/trimovp.rs fully
    # commented out; CLI entry commented at cli.rs:286-292 with alias
    # "tr") -- working deterministic equivalent, see tools/trimovp.py
    p = cmd("trimovp", ["tr"], "EXTRA: trim PAF overlaps (dead code in wgatools)")
    p.add_argument("input", nargs="?", default=None)

    # OPTIONAL EXTRA: paf2blocks is dead code (converter.rs:128-145 +
    # cigar.rs:83-152 commented out, no CLI entry ever) -- working
    # equivalent, see tools/convert.py paf2blocks + PARITY.md
    p = cmd("paf2blocks", ["p2b"], "EXTRA: PAF to blocks TSV (dead code in wgatools)")
    p.add_argument("input", nargs="?", default=None)

    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    init_logger(args.verbose)
    from .core.metrics import METRICS, maybe_trace

    try:
        with maybe_trace(), METRICS.stage("total"):
            dispatch(args)
    except WGAError as e:
        log.error(str(e))
        sys.exit(1)
    except BrokenPipeError:
        sys.exit(0)
    finally:
        if args.verbose >= 2:
            METRICS.report()
    return 0


def dispatch(args):
    from .io.chain import ChainReader
    from .io.compression import open_input, open_output
    from .io.maf import MafReader
    from .io.paf import PafReader

    cmd = args.command
    out = args.outfile
    rw = args.rewrite

    if cmd in ("maf2paf", "m2p"):
        from .parallel.host_pool import is_plain_seekable, parallel_maf2paf
        from .tools.convert import maf2paf

        from .parallel.dist_tools import dist_requested

        if dist_requested() and is_plain_seekable(args.input):
            from .parallel.dist_tools import dist_output, distributed_maf2paf
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            distributed_maf2paf(
                args.input, dist_output(out, rw), args.query_name
            )
        elif args.threads > 1 and is_plain_seekable(args.input):
            parallel_maf2paf(
                args.input, open_output(out, rw), args.threads, args.query_name
            )
        else:
            maf2paf(
                MafReader(open_input(args.input)),
                open_output(out, rw),
                args.query_name,
            )
    elif cmd in ("maf2chain", "m2c"):
        from .parallel.host_pool import is_plain_seekable, parallel_maf2chain
        from .tools.convert import maf2chain

        from .parallel.dist_tools import dist_requested

        if dist_requested() and is_plain_seekable(args.input):
            from .parallel.dist_tools import dist_output, distributed_maf2chain
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            distributed_maf2chain(
                args.input, dist_output(out, rw), args.query_name
            )
        elif args.threads > 1 and is_plain_seekable(args.input):
            parallel_maf2chain(
                args.input, open_output(out, rw), args.threads, args.query_name
            )
        else:
            maf2chain(
                MafReader(open_input(args.input)),
                open_output(out, rw),
                args.query_name,
            )
    elif cmd in ("paf2maf", "p2m"):
        from .tools.convert import paf2maf

        paf2maf(
            PafReader(open_input(args.input)),
            open_output(out, rw),
            args.target,
            args.query,
        )
    elif cmd in ("paf2chain", "p2c"):
        from .parallel.host_pool import is_plain_seekable, parallel_paf2chain
        from .tools.convert import paf2chain

        from .parallel.dist_tools import dist_requested

        if dist_requested() and is_plain_seekable(args.input):
            from .parallel.dist_tools import dist_output, distributed_paf2chain
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            distributed_paf2chain(args.input, dist_output(out, rw))
        elif args.threads > 1 and is_plain_seekable(args.input):
            parallel_paf2chain(args.input, open_output(out, rw), args.threads)
        else:
            paf2chain(PafReader(open_input(args.input)), open_output(out, rw))
    elif cmd in ("chain2maf", "c2m"):
        from .tools.convert import chain2maf

        chain2maf(
            ChainReader(open_input(args.input)),
            open_output(out, rw),
            args.target,
            args.query,
        )
    elif cmd in ("chain2paf", "c2p"):
        from .parallel.host_pool import is_plain_seekable, parallel_chain2paf
        from .tools.convert import chain2paf

        from .parallel.dist_tools import dist_requested

        if dist_requested() and is_plain_seekable(args.input):
            from .parallel.dist_tools import dist_output, distributed_chain2paf
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            distributed_chain2paf(args.input, dist_output(out, rw))
        elif args.threads > 1 and is_plain_seekable(args.input):
            parallel_chain2paf(args.input, open_output(out, rw), args.threads)
        else:
            chain2paf(ChainReader(open_input(args.input)), open_output(out, rw))
    elif cmd in ("maf2sam", "m2s"):
        from .tools.convert import maf2sam

        maf2sam(
            MafReader(open_input(args.input)), open_output(out, rw),
            real=args.real,
        )
    elif cmd in ("maf-index", "mi"):
        from .io.compression import open_output as _oo
        from .tools.index import build_index, index_path_for

        outpath = index_path_for(args.input) if out == "-" else out
        build_index(MafReader.from_path(args.input), _oo(outpath, True))
    elif cmd in ("maf-ext", "me"):
        from .errors import StdinNotAllowed
        from .tools.index import index_path_for, load_index
        from .tools.mafextra import maf_extract_idx

        if args.input is None or args.input == "-":
            raise StdinNotAllowed()
        regions = args.regions.split(",") if args.regions else None
        mafindex = load_index(index_path_for(args.input))
        failed = maf_extract_idx(
            regions,
            args.file,
            MafReader.from_path(args.input),
            mafindex,
            open_output(out, rw),
        )
        for region in failed:
            log.warning("Failed region: %s", region)
    elif cmd in ("chunk", "ch"):
        from .tools.chunk import chunk_maf

        chunk_maf(MafReader(open_input(args.input)), args.length, open_output(out, rw))
    elif cmd in ("call", "c"):
        _dispatch_call(args, out, rw)
    elif cmd in ("stat", "st"):
        from .parallel.host_pool import is_plain_seekable, parallel_stat_maf
        from .tools.stat import stat_maf, stat_paf

        from .parallel.dist_tools import dist_requested

        if (
            dist_requested()
            and args.format == "paf"
            and is_plain_seekable(args.input)
        ):
            from .parallel.dist_tools import dist_output, distributed_stat_paf
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            distributed_stat_paf(args.input, dist_output(out, rw), args.each)
        elif (
            dist_requested()
            and args.format == "maf"
            and is_plain_seekable(args.input)
        ):
            # multi-process mode: WGA_TPU_DIST=1 + coordinator env vars;
            # uses <input>.index as the shard manifest when present
            from .parallel.dist_tools import dist_output, distributed_stat_maf
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            distributed_stat_maf(
                args.input, dist_output(out, rw), args.each, args.query_name
            )
        elif args.format == "maf":
            if args.threads > 1 and is_plain_seekable(args.input):
                parallel_stat_maf(
                    args.input,
                    open_output(out, rw),
                    args.threads,
                    args.each,
                    args.query_name,
                )
            else:
                stat_maf(
                    MafReader(open_input(args.input)),
                    open_output(out, rw),
                    args.each,
                    args.query_name,
                )
        else:
            from .parallel.host_pool import parallel_stat_paf

            if args.threads > 1 and is_plain_seekable(args.input):
                parallel_stat_paf(
                    args.input, open_output(out, rw), args.threads, args.each
                )
            else:
                stat_paf(
                    PafReader(open_input(args.input)),
                    open_output(out, rw),
                    args.each,
                )
    elif cmd in ("dotplot", "dp"):
        from .parallel.dist_tools import dist_requested
        from .parallel.host_pool import is_plain_seekable
        from .tools.dotplot import dotplot

        _dist = dist_requested() and is_plain_seekable(args.input)
        if _dist:
            from .parallel.dist_tools import dist_output
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            w = dist_output(out, rw)
        else:
            w = open_output(out, rw)
        dotplot(
            args.input,
            w,
            args.format,
            args.out_format,
            args.mode,
            args.no_identity,
            args.length if args.length is not None else 50,
            args.query_name,
            args.color,
            threads=(
                args.threads
                if args.threads > 1 and is_plain_seekable(args.input)
                else 1
            ),
            dist=_dist,
        )
    elif cmd in ("filter", "fl"):
        from .tools.filter import (
            filter_chain,
            filter_maf,
            filter_paf,
            filter_paf_align_pair,
        )

        from .parallel.dist_tools import dist_requested

        _dist_filter = (
            dist_requested()
            and args.format == "paf"
            and args.min_align_size is not None
        )
        # in distributed mode only process 0 may open the real output
        # (see dist_tools.dist_output); defer the open to the dist branch
        w = None if _dist_filter else open_output(out, rw)
        if args.format == "maf":
            filter_maf(
                MafReader(open_input(args.input)),
                w,
                args.min_block_size,
                args.min_query_size,
            )
        elif args.format == "paf":
            if args.min_align_size is not None:
                log.warning(
                    "`min_align_size` is set, will not filter paf "
                    "`min_block_size` and `min_query_size`"
                )
                from .parallel.host_pool import (
                    is_plain_seekable,
                    parallel_filter_paf_align_pair,
                )

                if _dist_filter and is_plain_seekable(args.input):
                    from .parallel.dist_tools import (
                        dist_output,
                        distributed_filter_paf_align_pair,
                    )
                    from .parallel.distributed import (
                        maybe_initialize_distributed,
                    )

                    maybe_initialize_distributed()
                    distributed_filter_paf_align_pair(
                        args.input, dist_output(out, rw), args.min_align_size
                    )
                elif args.threads > 1 and is_plain_seekable(args.input):
                    parallel_filter_paf_align_pair(
                        args.input, w, args.threads, args.min_align_size
                    )
                else:
                    filter_paf_align_pair(
                        PafReader(open_input(args.input)),
                        w if w is not None else open_output(out, rw),
                        args.min_align_size,
                    )
            else:
                filter_paf(
                    PafReader(open_input(args.input)),
                    w,
                    args.min_block_size,
                    args.min_query_size,
                )
        else:
            filter_chain(
                ChainReader(open_input(args.input)),
                w,
                args.min_block_size,
                args.min_query_size,
            )
    elif cmd in ("rename", "rn"):
        from .tools.rename import rename_maf

        rename_maf(
            MafReader(open_input(args.input)),
            open_output(out, rw),
            args.prefixs.split(","),
        )
    elif cmd in ("pafcov", "pc"):
        from .parallel.dist_tools import dist_requested
        from .parallel.host_pool import is_plain_seekable, parallel_pafcov
        from .tools.pafcov import pafcov

        if dist_requested() and is_plain_seekable(args.input):
            from .parallel.dist_tools import dist_output, distributed_pafcov
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            distributed_pafcov(args.input, dist_output(out, rw))
        elif args.threads > 1 and is_plain_seekable(args.input):
            parallel_pafcov(args.input, open_output(out, rw), args.threads)
        else:
            pafcov(PafReader(open_input(args.input)), open_output(out, rw))
    elif cmd in ("pafpseudo", "pp"):
        from .parallel.dist_tools import dist_requested
        from .tools.pseudomaf import generate_pseudo_maf

        stripe = None
        if dist_requested():
            import jax

            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            stripe = (jax.process_index(), jax.process_count())
        generate_pseudo_maf(
            PafReader(open_input(args.input)),
            out,
            args.fasta,
            args.target,
            rw,
            threads=args.threads,
            stripe=stripe,
        )
    elif cmd in ("gen-completion", "gc"):
        from .tools.completion import gen_completion

        gen_completion(args.shell, open_output(out, rw))
    elif cmd in ("validate", "vf"):
        from .tools.validate import validate_paf

        fix_requested = args.fix is not None
        if fix_requested:
            # fixed output must not clobber the input (utils.rs:750-758)
            input_path = args.input if args.input else "stdin"
            if args.fix == input_path:
                raise WGAError(
                    "fixed file should not be the same as output file"
                )
        from .parallel.dist_tools import dist_requested
        from .parallel.host_pool import is_plain_seekable, parallel_validate_paf

        if dist_requested() and is_plain_seekable(args.input):
            from .parallel.dist_tools import dist_output, distributed_validate_paf
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            # fix output through dist_output too: only rank 0 may open
            # the real file (other ranks would race the overwrite guard
            # and corrupt the merged write -- round-5 review finding)
            fix_writer = (
                dist_output(args.fix, True) if fix_requested else None
            )
            distributed_validate_paf(
                args.input,
                dist_output(out, rw),
                fix_writer,
                fix_requested,
            )
        elif args.threads > 1 and is_plain_seekable(args.input):
            fix_writer = open_output(args.fix, True) if fix_requested else None
            parallel_validate_paf(
                args.input,
                open_output(out, rw),
                args.threads,
                fix_writer,
                fix_requested,
            )
        else:
            fix_writer = open_output(args.fix, True) if fix_requested else None
            validate_paf(
                PafReader(open_input(args.input)),
                open_output(out, rw),
                fix_writer,
                fix_requested,
            )
    elif cmd in ("tview", "tv"):
        from .tools.tview import tview

        tview(args.input, args.step)
    elif cmd in ("pileup", "pl"):
        from .tools.pileup import pileup

        pileup(
            MafReader(open_input(args.input)),
            open_output(out, rw),
            args.all_sites,
        )
    elif cmd in ("trimovp", "tr"):
        from .tools.trimovp import trim_ovp

        trim_ovp(PafReader(open_input(args.input)), open_output(out, rw))
    elif cmd in ("paf2blocks", "p2b"):
        from .tools.convert import paf2blocks

        paf2blocks(PafReader(open_input(args.input)), open_output(out, rw))
    else:
        raise WGAError(f"unknown command {cmd}")


def _dispatch_call(args, out, rw):
    from .io.compression import open_input, open_output
    from .io.maf import MafReader
    from .io.paf import PafReader
    from .tools.caller import call_var_maf, call_var_paf

    if args.format == "maf":
        mafindex = None
        if args.input and args.input != "-":
            import os

            from .tools.index import index_path_for, load_index

            idx_path = index_path_for(args.input)
            if os.path.exists(idx_path):
                mafindex = load_index(idx_path)
        if mafindex is None:
            log.warning("maf index not found, will not generate contig info")
        regex = (
            _wrap_regex_full_match(args.query_regex)
            if args.query_regex
            else None
        )
        from .parallel.dist_tools import dist_requested
        from .parallel.host_pool import is_plain_seekable, parallel_call_maf

        # NOTE: no `and mafindex` here -- distributed_call_maf loads its
        # own index and falls back to a raw offset scan when it is
        # missing; gating on the parent's index would silently drop
        # every rank into the serial branch, racing the output file.
        # is_plain_seekable: the offset manifest needs a plain file
        # (compressed inputs would seek bogus raw-byte offsets)
        # (round-5 review findings)
        if dist_requested() and is_plain_seekable(args.input):
            from .parallel.dist_tools import dist_output, distributed_call_maf
            from .parallel.distributed import maybe_initialize_distributed

            maybe_initialize_distributed()
            distributed_call_maf(
                args.input,
                dist_output(out, rw),
                args.snp,
                args.inv,
                args.svlen,
                args.sample,
                args.query_name,
                regex,
                args.chunk_size,
            )
        elif args.threads > 1 and is_plain_seekable(args.input):
            parallel_call_maf(
                args.input,
                open_output(out, rw),
                args.threads,
                mafindex,
                args.snp,
                args.inv,
                args.svlen,
                args.sample,
                args.query_name,
                regex,
                args.chunk_size,
            )
        else:
            call_var_maf(
                MafReader(open_input(args.input)),
                mafindex,
                open_output(out, rw),
                args.snp,
                args.inv,
                args.svlen,
                args.sample,
                args.query_name,
                regex,
                args.chunk_size,
            )
    else:
        if not args.target or not args.query:
            raise WGAError("target and query are necessary")
        call_var_paf(
            PafReader(open_input(args.input)),
            args.target,
            args.query,
            open_output(out, rw),
            args.snp,
            args.svlen,
            args.sample,
        )


if __name__ == "__main__":
    sys.exit(main())
