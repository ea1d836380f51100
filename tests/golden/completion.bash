_wgatools_tpu() {
    local cur prev cmd opts
    COMPREPLY=()
    cur="${COMP_WORDS[COMP_CWORD]}"
    prev="${COMP_WORDS[COMP_CWORD-1]}"
    cmd=""
    if [ "$COMP_CWORD" -ge 1 ]; then
        cmd="${COMP_WORDS[1]}"
    fi
    if [ "$COMP_CWORD" -eq 1 ]; then
        COMPREPLY=( $(compgen -W "maf2paf m2p maf2chain m2c paf2maf p2m paf2chain p2c chain2maf c2m chain2paf c2p maf-index mi maf-ext me chunk ch call c tview tv stat st dotplot dp filter fl rename rn maf2sam m2s pafcov pc pafpseudo pp gen-completion gc validate vf pileup pl trimovp tr paf2blocks p2b --version -h --help" -- "$cur") )
        return 0
    fi
    case "$prev" in
        -f|--format)
            COMPREPLY=( $(compgen -W "maf paf" -- "$cur") )
            return 0
            ;;
        -f|--format)
            COMPREPLY=( $(compgen -W "maf paf" -- "$cur") )
            return 0
            ;;
        -f|--format)
            COMPREPLY=( $(compgen -W "maf paf" -- "$cur") )
            return 0
            ;;
        --out-format|--out_format)
            COMPREPLY=( $(compgen -W "html json csv" -- "$cur") )
            return 0
            ;;
        -m|--mode)
            COMPREPLY=( $(compgen -W "base-level overview" -- "$cur") )
            return 0
            ;;
        -f|--format)
            COMPREPLY=( $(compgen -W "maf paf chain" -- "$cur") )
            return 0
            ;;
        -s|--shell)
            COMPREPLY=( $(compgen -W "bash zsh fish" -- "$cur") )
            return 0
            ;;
    esac
    opts=""
    case "$cmd" in
        maf2paf|m2p)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -q --query-name --query_name"
            ;;
        maf2chain|m2c)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -q --query-name --query_name"
            ;;
        paf2maf|p2m)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -g --target -q --query"
            ;;
        paf2chain|p2c)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose"
            ;;
        chain2maf|c2m)
            opts="-h --help -o --outfile -r --rewrite --threads -v --verbose -t -g --target -q --query"
            ;;
        chain2paf|c2p)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose"
            ;;
        maf-index|mi)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose"
            ;;
        maf-ext|me)
            opts="-h --help -o --outfile --rewrite -t --threads -v --verbose -r -R --regions -f --file"
            ;;
        chunk|ch)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -l --length"
            ;;
        call|c)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -n --sample -s --snp -i --inv -l --svlen -f --format --target -q --query --query-name --query_name --query-regex -c --chunk-size --chunk_size"
            ;;
        tview|tv)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -s --step"
            ;;
        stat|st)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -f --format -e --each -q --query-name --query_name"
            ;;
        dotplot|dp)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -f --format --out-format --out_format -m --mode -d --no-identity --no_identity -l --length -q --query-name --query_name --color"
            ;;
        filter|fl)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -f --format -b --min-block-size --min_block_size -q --min-query-size --min_query_size -a --min-align-size --min_align_size"
            ;;
        rename|rn)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -p --prefixs"
            ;;
        maf2sam|m2s)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose --real"
            ;;
        pafcov|pc)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose"
            ;;
        pafpseudo|pp)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -f --fasta -g --target"
            ;;
        gen-completion|gc)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -s --shell"
            ;;
        validate|vf)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -f --fix"
            ;;
        pileup|pl)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose -a --all"
            ;;
        trimovp|tr)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose"
            ;;
        paf2blocks|p2b)
            opts="-h --help -o --outfile -r --rewrite -t --threads -v --verbose"
            ;;
    esac
    if [[ "$cur" == -* ]]; then
        COMPREPLY=( $(compgen -W "$opts" -- "$cur") )
        return 0
    fi
    COMPREPLY=( $(compgen -f -- "$cur") )
}
complete -o bashdefault -o default -F _wgatools_tpu wgatools-tpu
