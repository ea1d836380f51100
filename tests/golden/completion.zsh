#compdef wgatools-tpu

_wgatools_tpu() {
    local -a subcmds
    subcmds=(
        'maf2paf:Convert MAF format to PAF format'
        'maf2chain:Convert MAF format to Chain format'
        'paf2maf:Convert PAF format to MAF format'
        'paf2chain:Convert PAF format to Chain format'
        'chain2maf:Convert Chain format to MAF format'
        'chain2paf:Convert Chain format to PAF format'
        'maf-index:Build index for MAF file'
        'maf-ext:Extract specific region from MAF file with index'
        'chunk:Chunk MAF file by length'
        'call:Call Variants from MAF/PAF file'
        'tview:View MAF file in terminal'
        'stat:Statistics for Alignment file'
        'dotplot:Plot dotplot for Alignment file'
        'filter:Filter records for Alignment file'
        'rename:Rename MAF records with prefix'
        'maf2sam:DEV: maf2sam'
        'pafcov:Calculate coverage for PAF file'
        'pafpseudo:Generate pesudo-maf for divergence analysis from PAF file'
        'gen-completion:Generate completion script for shell'
        'validate:Validate and fix query&target position in PAF file by CIGAR'
        'pileup:EXTRA: merged MAF pileup (dead code in wgatools)'
        'trimovp:EXTRA: trim PAF overlaps (dead code in wgatools)'
        'paf2blocks:EXTRA: PAF to blocks TSV (dead code in wgatools)'
    )
    if (( CURRENT == 2 )); then
        _describe 'command' subcmds
        return
    fi
    case "$words[2]" in
        maf2paf|m2p)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-q --query-name --query_name)-q[]:arg:_files' \
                '(-q --query-name --query_name)--query-name[]:arg:_files' \
                '(-q --query-name --query_name)--query_name[]:arg:_files' \
                '*:file:_files'
            ;;
        maf2chain|m2c)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-q --query-name --query_name)-q[]:arg:_files' \
                '(-q --query-name --query_name)--query-name[]:arg:_files' \
                '(-q --query-name --query_name)--query_name[]:arg:_files' \
                '*:file:_files'
            ;;
        paf2maf|p2m)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-g --target)-g[]:arg:_files' \
                '(-g --target)--target[]:arg:_files' \
                '(-q --query)-q[]:arg:_files' \
                '(-q --query)--query[]:arg:_files' \
                '*:file:_files'
            ;;
        paf2chain|p2c)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '*:file:_files'
            ;;
        chain2maf|c2m)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(--threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-t -g --target)-t[]:arg:_files' \
                '(-t -g --target)-g[]:arg:_files' \
                '(-t -g --target)--target[]:arg:_files' \
                '(-q --query)-q[]:arg:_files' \
                '(-q --query)--query[]:arg:_files' \
                '*:file:_files'
            ;;
        chain2paf|c2p)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '*:file:_files'
            ;;
        maf-index|mi)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '*:file:_files'
            ;;
        maf-ext|me)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(--rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-r -R --regions)-r[]:arg:_files' \
                '(-r -R --regions)-R[]:arg:_files' \
                '(-r -R --regions)--regions[]:arg:_files' \
                '(-f --file)-f[]:arg:_files' \
                '(-f --file)--file[]:arg:_files' \
                '*:file:_files'
            ;;
        chunk|ch)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-l --length)-l[]:arg:_files' \
                '(-l --length)--length[]:arg:_files' \
                '*:file:_files'
            ;;
        call|c)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-n --sample)-n[]:arg:_files' \
                '(-n --sample)--sample[]:arg:_files' \
                '(-s --snp)-s[]' \
                '(-s --snp)--snp[]' \
                '(-i --inv)-i[]' \
                '(-i --inv)--inv[]' \
                '(-l --svlen)-l[]:arg:_files' \
                '(-l --svlen)--svlen[]:arg:_files' \
                '(-f --format)-f[]:arg:(maf paf)' \
                '(-f --format)--format[]:arg:(maf paf)' \
                '(--target)--target[]:arg:_files' \
                '(-q --query)-q[]:arg:_files' \
                '(-q --query)--query[]:arg:_files' \
                '(--query-name --query_name)--query-name[]:arg:_files' \
                '(--query-name --query_name)--query_name[]:arg:_files' \
                '(--query-regex)--query-regex[]:arg:_files' \
                '(-c --chunk-size --chunk_size)-c[]:arg:_files' \
                '(-c --chunk-size --chunk_size)--chunk-size[]:arg:_files' \
                '(-c --chunk-size --chunk_size)--chunk_size[]:arg:_files' \
                '*:file:_files'
            ;;
        tview|tv)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-s --step)-s[]:arg:_files' \
                '(-s --step)--step[]:arg:_files' \
                '*:file:_files'
            ;;
        stat|st)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-f --format)-f[]:arg:(maf paf)' \
                '(-f --format)--format[]:arg:(maf paf)' \
                '(-e --each)-e[]' \
                '(-e --each)--each[]' \
                '(-q --query-name --query_name)-q[]:arg:_files' \
                '(-q --query-name --query_name)--query-name[]:arg:_files' \
                '(-q --query-name --query_name)--query_name[]:arg:_files' \
                '*:file:_files'
            ;;
        dotplot|dp)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-f --format)-f[]:arg:(maf paf)' \
                '(-f --format)--format[]:arg:(maf paf)' \
                '(--out-format --out_format)--out-format[]:arg:(html json csv)' \
                '(--out-format --out_format)--out_format[]:arg:(html json csv)' \
                '(-m --mode)-m[]:arg:(base-level overview)' \
                '(-m --mode)--mode[]:arg:(base-level overview)' \
                '(-d --no-identity --no_identity)-d[]' \
                '(-d --no-identity --no_identity)--no-identity[]' \
                '(-d --no-identity --no_identity)--no_identity[]' \
                '(-l --length)-l[]:arg:_files' \
                '(-l --length)--length[]:arg:_files' \
                '(-q --query-name --query_name)-q[]:arg:_files' \
                '(-q --query-name --query_name)--query-name[]:arg:_files' \
                '(-q --query-name --query_name)--query_name[]:arg:_files' \
                '(--color)--color[]:arg:_files' \
                '*:file:_files'
            ;;
        filter|fl)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-f --format)-f[]:arg:(maf paf chain)' \
                '(-f --format)--format[]:arg:(maf paf chain)' \
                '(-b --min-block-size --min_block_size)-b[]:arg:_files' \
                '(-b --min-block-size --min_block_size)--min-block-size[]:arg:_files' \
                '(-b --min-block-size --min_block_size)--min_block_size[]:arg:_files' \
                '(-q --min-query-size --min_query_size)-q[]:arg:_files' \
                '(-q --min-query-size --min_query_size)--min-query-size[]:arg:_files' \
                '(-q --min-query-size --min_query_size)--min_query_size[]:arg:_files' \
                '(-a --min-align-size --min_align_size)-a[]:arg:_files' \
                '(-a --min-align-size --min_align_size)--min-align-size[]:arg:_files' \
                '(-a --min-align-size --min_align_size)--min_align_size[]:arg:_files' \
                '*:file:_files'
            ;;
        rename|rn)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-p --prefixs)-p[]:arg:_files' \
                '(-p --prefixs)--prefixs[]:arg:_files' \
                '*:file:_files'
            ;;
        maf2sam|m2s)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(--real)--real[]' \
                '*:file:_files'
            ;;
        pafcov|pc)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '*:file:_files'
            ;;
        pafpseudo|pp)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-f --fasta)-f[]:arg:_files' \
                '(-f --fasta)--fasta[]:arg:_files' \
                '(-g --target)-g[]:arg:_files' \
                '(-g --target)--target[]:arg:_files' \
                '*:file:_files'
            ;;
        gen-completion|gc)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-s --shell)-s[]:arg:(bash zsh fish)' \
                '(-s --shell)--shell[]:arg:(bash zsh fish)' \
                '*:file:_files'
            ;;
        validate|vf)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-f --fix)-f[]:arg:_files' \
                '(-f --fix)--fix[]:arg:_files' \
                '*:file:_files'
            ;;
        pileup|pl)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-a --all)-a[]' \
                '(-a --all)--all[]' \
                '*:file:_files'
            ;;
        trimovp|tr)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '*:file:_files'
            ;;
        paf2blocks|p2b)
            _arguments '(-h --help)-h[show this help message and exit]' \
                '(-h --help)--help[show this help message and exit]' \
                '(-o --outfile)-o[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-o --outfile)--outfile[Output file ("-" for stdout), names ending in .gz/.bz2/.xz are compressed automatically]:arg:_files' \
                '(-r --rewrite)-r[Bool, if rewrite output file [default: false]]' \
                '(-r --rewrite)--rewrite[Bool, if rewrite output file [default: false]]' \
                '(-t --threads)-t[Threads, default 1]:arg:_files' \
                '(-t --threads)--threads[Threads, default 1]:arg:_files' \
                '(-v --verbose)-v[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '(-v --verbose)--verbose[Logging level [-v: Info, -vv: Debug, -vvv: Trace, default: Warn]]' \
                '*:file:_files'
            ;;
        *)
            _files
            ;;
    esac
}
_wgatools_tpu "$@"
