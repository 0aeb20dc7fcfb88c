from .codec import (  # noqa: F401
    BLOCK_SIZE,
    decode_block,
    decode_posting_list,
    encode_blocks,
    vbyte_decode,
    vbyte_encode,
)
