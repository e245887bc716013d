from rowbowt_tpu.io.fastq import read_seqs  # noqa: F401
