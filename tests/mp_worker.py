"""One process of the multi-host integration test (tests/test_multiprocess.py).

Spawned N times with a shared coordinator address; exercises the full
multi-host flow: jax.distributed bootstrap → per-host table slices → global
mesh shuffle join → count oracles.  Prints ``MP_OK`` on success.
"""

import sys

import numpy as np


def main() -> int:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from partitionedhashjoin_tpu.parallel import distributed
    from partitionedhashjoin_tpu.parallel.shuffle import DistributedShuffleJoiner

    distributed.initialize(coord, nproc, pid, platform="cpu")
    import jax

    assert jax.process_count() == nproc
    mesh = distributed.global_mesh()

    # oracle 1 (non-trivial intersection): A = all even keys in [0, 8192),
    # assembled from per-host slices; B = 0..8191 -> exactly half match
    a_start, a_rows = distributed.host_slice(4096)
    keys_a = np.arange(a_start, a_start + a_rows, dtype=np.int32) * 2
    pays_a = np.arange(a_start, a_start + a_rows, dtype=np.int32)
    b_start, b_rows = distributed.host_slice(8192)
    keys_b = np.arange(b_start, b_start + b_rows, dtype=np.int32)
    table_a = distributed.make_global_table(keys_a, pays_a, mesh)
    table_b = distributed.make_global_table(keys_b, keys_b, mesh)
    count = DistributedShuffleJoiner(mesh, seed=3).run(table_a, table_b)
    assert count == 4096, f"even-key oracle: got {count}"

    # oracle 2 (generated benchmark shape): sequential primary covers the
    # Zipf domain, so every secondary row matches
    ta, tb = distributed.generate_global_tables(1024, 4096, 1.05, mesh, seed=11)
    c2 = DistributedShuffleJoiner(mesh, seed=5).run(ta, tb)
    assert c2 == 4096, f"zipf oracle: got {c2}"

    # oracle 3: pipelined exchange agrees with the one-shot exchange
    c3 = DistributedShuffleJoiner(mesh, seed=7, pipeline_chunks=2).run(ta, tb)
    assert c3 == 4096, f"pipelined oracle: got {c3}"

    print(f"MP_OK pid={pid} counts={count},{c2},{c3}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
