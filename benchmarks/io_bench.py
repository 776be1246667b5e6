"""Out-of-core loader IO benchmark: random-row vs block-then-row sampling.

Writes a multi-GB row file, evicts it from the page cache with
posix_fadvise(DONTNEED) before each run, and measures user-data throughput
of the C++ prefetch loader in both sampling modes. Random 40-byte-row reads
touch a full 4KB page each (~100x amplification); block sampling makes the
reads sequential runs.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from henbun_tpu.io import loader as hbio


def evict(path):
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)


def main(gb=2.0, row_floats=10, batch_rows=1 << 16, batches=24):
    path = "/tmp/hb_io_bench.f32"
    row_bytes = row_floats * 4
    n_rows = int(gb * (1 << 30) / row_bytes)
    if not (
        os.path.exists(path)
        and os.path.getsize(path) == n_rows * row_bytes
    ):
        print("writing %.1f GB (%d rows)..." % (gb, n_rows), flush=True)
        chunk = 1 << 22
        rng = np.random.default_rng(0)
        with open(path, "wb") as f:
            left = n_rows
            while left:
                m = min(chunk, left)
                f.write(
                    rng.normal(size=(m * row_floats,))
                    .astype(np.float32)
                    .tobytes()
                )
                left -= m
    for mode, block in (("random-row", 0), ("block-256", 256), ("block-4096", 4096)):
        evict(path)
        with hbio.OutOfCoreLoader(
            path, n_rows, row_floats, batch_rows=batch_rows,
            n_buffers=3, n_threads=2, seed=1, block_rows=block,
        ) as dl:
            dl.next()  # spin-up
            t0 = time.perf_counter()
            for _ in range(batches):
                dl.next()
            dt = time.perf_counter() - t0
        mb = batches * batch_rows * row_bytes / 1e6
        print(
            "%-11s %8.1f MB/s user data (%.2f s for %.0f MB)"
            % (mode, mb / dt, dt, mb),
            flush=True,
        )


if __name__ == "__main__":
    main(gb=float(sys.argv[1]) if len(sys.argv) > 1 else 2.0)
