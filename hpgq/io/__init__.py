from .fastq import FastqReader, RecordBlock, FastqWriter, open_maybe_gzip  # noqa: F401
from .packer import BASE_LUT, pack_block  # noqa: F401
