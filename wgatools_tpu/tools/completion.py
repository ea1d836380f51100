"""Shell completion generated from the live argparse tree.

The reference generates full per-subcommand, per-flag completions with
clap_complete (reference: src/utils.rs:727-732, src/cli.rs:292-298).
The equivalent here introspects `cli.build_parser()` -- subcommands,
visible aliases, every flag with its value/choice arity -- so the
scripts can never drift from the actual CLI surface.

Supported shells match the reference subset exposed by our CLI:
bash, zsh, fish.
"""

from __future__ import annotations

import argparse


def _iter_subparsers(parser):
    """Yield (canonical_name, aliases, subparser, help) once per parser."""
    sub_action = next(
        a
        for a in parser._actions
        if isinstance(a, argparse._SubParsersAction)
    )
    help_by_name = {
        ca.dest: (ca.help or "") for ca in sub_action._choices_actions
    }
    seen = {}
    order = []
    for name, sp in sub_action.choices.items():
        if id(sp) not in seen:
            seen[id(sp)] = (name, [], sp)
            order.append(id(sp))
        else:
            seen[id(sp)][1].append(name)
    for key in order:
        name, aliases, sp = seen[key]
        yield name, aliases, sp, help_by_name.get(name, "")


def _flag_infos(sp):
    """(option_strings, takes_value, choices, help) per optional action."""
    out = []
    for a in sp._actions:
        if not a.option_strings:
            continue
        takes_value = not (a.nargs == 0)
        choices = list(a.choices) if a.choices else None
        out.append((a.option_strings, takes_value, choices, a.help or ""))
    return out


def _esc(s: str) -> str:
    return s.replace("'", "'\\''")


def _gen_bash(parser) -> str:
    subs = []
    cases = []
    value_cases = []
    for name, aliases, sp, _help in _iter_subparsers(parser):
        names = [name] + aliases
        subs.extend(names)
        flags = _flag_infos(sp)
        all_opts = " ".join(o for opts, _, _, _ in flags for o in opts)
        pat = "|".join(names)
        cases.append(
            f'        {pat})\n            opts="{all_opts}"\n            ;;'
        )
        for opts, takes_value, choices, _ in flags:
            if takes_value and choices:
                opat = "|".join(opts)
                value_cases.append(
                    f'        {opat})\n'
                    f'            COMPREPLY=( $(compgen -W "'
                    f'{" ".join(str(c) for c in choices)}" -- "$cur") )\n'
                    f"            return 0\n            ;;"
                )
    prog = parser.prog
    fname = "_" + prog.replace("-", "_")
    case_block = "\n".join(cases)
    value_block = "\n".join(value_cases)
    return f"""\
{fname}() {{
    local cur prev cmd opts
    COMPREPLY=()
    cur="${{COMP_WORDS[COMP_CWORD]}}"
    prev="${{COMP_WORDS[COMP_CWORD-1]}}"
    cmd=""
    if [ "$COMP_CWORD" -ge 1 ]; then
        cmd="${{COMP_WORDS[1]}}"
    fi
    if [ "$COMP_CWORD" -eq 1 ]; then
        COMPREPLY=( $(compgen -W "{" ".join(subs)} --version -h --help" -- "$cur") )
        return 0
    fi
    case "$prev" in
{value_block}
    esac
    opts=""
    case "$cmd" in
{case_block}
    esac
    if [[ "$cur" == -* ]]; then
        COMPREPLY=( $(compgen -W "$opts" -- "$cur") )
        return 0
    fi
    COMPREPLY=( $(compgen -f -- "$cur") )
}}
complete -o bashdefault -o default -F {fname} {prog}
"""


def _gen_zsh(parser) -> str:
    prog = parser.prog
    sub_lines = []
    case_lines = []
    for name, aliases, sp, help_ in _iter_subparsers(parser):
        names = [name] + aliases
        sub_lines.append(f"        '{name}:{_esc(help_)}'")
        specs = []
        for opts, takes_value, choices, fhelp in _flag_infos(sp):
            group = "(" + " ".join(opts) + ")"
            for o in opts:
                spec = f"'{group}{o}[{_esc(fhelp)}]"
                if takes_value:
                    if choices:
                        spec += f":arg:({' '.join(str(c) for c in choices)})"
                    else:
                        spec += ":arg:_files"
                spec += "'"
                specs.append(spec)
        specs.append("'*:file:_files'")
        pat = "|".join(names)
        case_lines.append(
            f"        {pat})\n            _arguments "
            + " \\\n                ".join(specs)
            + "\n            ;;"
        )
    fname = "_" + prog.replace("-", "_")
    nl = "\n"
    return f"""\
#compdef {prog}

{fname}() {{
    local -a subcmds
    subcmds=(
{nl.join(sub_lines)}
    )
    if (( CURRENT == 2 )); then
        _describe 'command' subcmds
        return
    fi
    case "$words[2]" in
{nl.join(case_lines)}
        *)
            _files
            ;;
    esac
}}
{fname} "$@"
"""


def _gen_fish(parser) -> str:
    prog = parser.prog
    lines = []
    all_names = []
    for name, aliases, sp, help_ in _iter_subparsers(parser):
        all_names.extend([name] + aliases)
    not_seen = (
        f"not __fish_seen_subcommand_from {' '.join(all_names)}"
    )
    for name, aliases, sp, help_ in _iter_subparsers(parser):
        names = [name] + aliases
        for n in names:
            lines.append(
                f"complete -c {prog} -n '{not_seen}' -f -a {n} "
                f"-d '{_esc(help_)}'"
            )
        seen = f"__fish_seen_subcommand_from {' '.join(names)}"
        for opts, takes_value, choices, fhelp in _flag_infos(sp):
            parts = [f"complete -c {prog} -n '{seen}'"]
            for o in opts:
                if o.startswith("--"):
                    parts.append(f"-l {o[2:]}")
                elif len(o) == 2:
                    parts.append(f"-s {o[1:]}")
                else:  # multi-char single-dash alias: fish "old style"
                    parts.append(f"-o {o[1:]}")
            if takes_value:
                parts.append("-r")
                if choices:
                    parts.append("-f")
                    parts.append(
                        f"-a '{' '.join(str(c) for c in choices)}'"
                    )
            parts.append(f"-d '{_esc(fhelp)}'")
            lines.append(" ".join(parts))
    return "\n".join(lines) + "\n"


def gen_completion(shell: str, writer):
    """Emit a completion script for `shell` (bash/zsh/fish).

    Equivalent of clap_complete's generate() (utils.rs:727-732): the
    script covers every subcommand (with aliases), every flag of every
    subcommand, and choice-value completion -- derived live from
    cli.build_parser().
    """
    from ..cli import build_parser

    parser = build_parser()
    if shell == "bash":
        script = _gen_bash(parser)
    elif shell == "zsh":
        script = _gen_zsh(parser)
    elif shell == "fish":
        script = _gen_fish(parser)
    else:  # pragma: no cover - argparse choices guard this
        raise ValueError(f"unsupported shell {shell}")
    writer.write(script.encode("utf-8"))
    writer.flush()
