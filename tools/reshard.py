"""Re-shard an sf testdata directory into the sharded-directory layout a
100x-scale input actually has: each table becomes ``<name>.parquet/`` holding
``part-XXXXX.parquet`` row-slices.  Used to verify the whole catalog runs
unchanged on sharded inputs:

    python tools/reshard.py /root/testdata/sf0.01 /tmp/sf0.01_sharded 3
    python tools/check_oracles.py /tmp/sf0.01_sharded
"""

import os
import sys

import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def reshard(src_dir: str, out_dir: str, shards: int = 3) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        tbl = pq.read_table(src)
        tdir = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        for f in os.listdir(tdir):
            if f.endswith(".parquet"):
                os.remove(os.path.join(tdir, f))
        n = tbl.num_rows
        # row-sliced shards; tiny tables still get >=1 non-empty shard
        k = max(1, min(shards, n or 1))
        per = (n + k - 1) // k if n else 0
        for s in range(k):
            piece = tbl.slice(s * per, per) if n else tbl
            path = os.path.join(tdir, f"part-{s:05d}.parquet")
            tmp = path + ".tmp"
            pq.write_table(piece, tmp)
            os.replace(tmp, path)
    return out_dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_sharded"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    print(reshard(src, dst, k))
