"""Shell completion generation (reference: clap_complete via utils.rs:727-732)."""

SUBCOMMANDS = [
    "maf2paf", "maf2chain", "paf2maf", "paf2chain", "chain2maf", "chain2paf",
    "maf-index", "maf-ext", "chunk", "call", "tview", "stat", "dotplot",
    "filter", "rename", "maf2sam", "pafcov", "pafpseudo", "gen-completion",
    "validate",
]

_BASH = """\
_wgatools_tpu() {{
    local cur prev
    cur="${{COMP_WORDS[COMP_CWORD]}}"
    if [ "$COMP_CWORD" -eq 1 ]; then
        COMPREPLY=( $(compgen -W "{subs}" -- "$cur") )
    else
        COMPREPLY=( $(compgen -f -- "$cur") )
    fi
}}
complete -F _wgatools_tpu wgatools-tpu
"""

_ZSH = """\
#compdef wgatools-tpu
_wgatools_tpu() {{
    local -a subs
    subs=({subs})
    if (( CURRENT == 2 )); then
        _describe 'command' subs
    else
        _files
    fi
}}
_wgatools_tpu "$@"
"""

_FISH = "\n".join(
    f"complete -c wgatools-tpu -n '__fish_use_subcommand' -a {s}"
    for s in SUBCOMMANDS
) + "\n"


def gen_completion(shell: str, writer):
    subs = " ".join(SUBCOMMANDS)
    if shell == "bash":
        script = _BASH.format(subs=subs)
    elif shell == "zsh":
        script = _ZSH.format(subs=subs)
    else:
        script = _FISH
    writer.write(script.encode("ascii"))
    writer.flush()
