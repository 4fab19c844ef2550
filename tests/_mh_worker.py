"""Worker process for the multi-host decode test (spawned by
test_multihost.py, one per fake host).  Joins the jax distributed
runtime on the CPU backend, decodes its GOP shard of a deterministic
stream, and verifies its frames bit-exactly against a local serial
decode.  Exits 0 only on full agreement."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'

import numpy as np  # noqa: E402


def main():
    port, num_proc, pid, n_tile = sys.argv[1:5]
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from jsmpeg_tpu.parallel import multihost as mh
    mh.initialize(f'127.0.0.1:{port}', int(num_proc), int(pid))

    from jsmpeg_tpu.testing.gen import encode_realistic_stream
    # enough GOPs that every host owns at least one real (non-padding)
    # row of the global 'gop' axis: G rows pad to a multiple of the gop
    # axis and split contiguously, per_host = G / num_proc
    n_frames = 14 if int(num_proc) <= 2 else 22
    es, _ = encode_realistic_stream(96, 128, n_frames=n_frames, seed=21,
                                    gop=3)

    seq, my_frames, my_planes = mh.decode_packed_multihost(
        es, n_tile=int(n_tile))
    assert my_frames, 'host decoded nothing'

    # local serial reference (single device, default jit path)
    from jsmpeg_tpu.models.mpeg1 import MPEG1Decoder
    dec = MPEG1Decoder()
    dec.write(0.0, es)
    ref = dec.decode_available(eof=True)
    for k, planes in zip(my_frames, my_planes):
        r = ref[k]
        np.testing.assert_array_equal(planes.y, np.asarray(r.y),
                                      err_msg=f'frame {k} Y')
        np.testing.assert_array_equal(planes.cr, np.asarray(r.cr),
                                      err_msg=f'frame {k} Cr')
        np.testing.assert_array_equal(planes.cb, np.asarray(r.cb),
                                      err_msg=f'frame {k} Cb')
    print(f'worker {pid}: {len(my_frames)} frames bit-exact '
          f'(global frames {my_frames})', flush=True)


if __name__ == '__main__':
    main()
