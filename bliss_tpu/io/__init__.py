from bliss_tpu.io.decoder import (
    AudioProbe,
    DecodedAudio,
    DecodeError,
    decode,
    decode_batch,
    iter_decode,
    native_version,
    probe,
)

__all__ = [
    "AudioProbe",
    "DecodedAudio",
    "DecodeError",
    "decode",
    "decode_batch",
    "iter_decode",
    "native_version",
    "probe",
]
