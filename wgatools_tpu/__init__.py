"""wgatools-tpu: a TPU-native engine for whole-genome-alignment file manipulation.

A from-scratch re-design of the capabilities of wgatools
(/root/reference, Rust CLI) for TPU hardware:

- Host I/O layer: streaming MAF/PAF/chain parsers that tokenize records into
  columnar numpy batches (uint8 base codes, run-length CIGAR op arrays,
  int64 coordinate tables).  See `wgatools_tpu.io` and `wgatools_tpu.core`.
- Device kernel layer: JAX/Pallas kernels for the per-column compute that the
  reference does with Rust char loops (column classification, run-length
  statistics, liftover prefix sums, coverage scatter-add).
  See `wgatools_tpu.ops`.
- Orchestration: `shard_map` over a record/interval axis with psum merges for
  multi-chip / multi-host execution.  See `wgatools_tpu.parallel`.
- Tools: one module per wgatools subcommand with byte-compatible output.
  See `wgatools_tpu.tools` and `wgatools_tpu.cli`.
"""

__version__ = "0.1.0"
