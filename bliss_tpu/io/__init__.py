from bliss_tpu.io.decoder import (
    DecodedAudio,
    DecodeError,
    decode,
    decode_batch,
    iter_decode,
    native_version,
)

__all__ = [
    "DecodedAudio",
    "DecodeError",
    "decode",
    "decode_batch",
    "iter_decode",
    "native_version",
]
