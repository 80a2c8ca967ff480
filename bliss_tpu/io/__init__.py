from bliss_tpu.io.decoder import (
    AudioProbe,
    DecodedAudio,
    DecodeError,
    EncodeError,
    decode,
    decode_batch,
    encode,
    iter_decode,
    native_version,
    probe,
)

__all__ = [
    "AudioProbe",
    "DecodedAudio",
    "DecodeError",
    "EncodeError",
    "decode",
    "decode_batch",
    "encode",
    "iter_decode",
    "native_version",
    "probe",
]
