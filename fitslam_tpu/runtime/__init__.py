from fitslam_tpu.runtime.native import (  # noqa: F401
    NativeEventLog,
    PgmSequenceReader,
    SpscRing,
    ensure_built,
    load_library,
    now_ns,
    write_pgm,
)
