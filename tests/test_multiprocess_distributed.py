"""Two-process jax.distributed bring-up (SURVEY.md §4 multi-host row).

Spawns two fresh CPU-only Python processes that rendezvous through
``initialize_distributed`` and each verify the global topology.  This
exercises the real coordinator/client handshake the TPU-pod path uses —
the closest thing to multi-host available on one machine.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
from ldagibbssampling_tpu.parallel.multihost import initialize_distributed

pid = int(sys.argv[1]); coord = sys.argv[2]
topo = initialize_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert topo.process_count == 2, topo
assert topo.process_index == pid, topo
assert topo.global_device_count == 2, topo
assert topo.local_device_count == 1, topo
print(f"proc {pid} ok")
"""


_SWEEP_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from ldagibbssampling_tpu.parallel.multihost import initialize_distributed
from ldagibbssampling_tpu.models.state import SamplerState
from ldagibbssampling_tpu.ops.gibbs import gibbs_sweep

shard_map = jax.shard_map

pid = int(sys.argv[1]); coord = sys.argv[2]
initialize_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert len(jax.devices()) == 2

# identical host-side corpus + init in both processes (same seed)
rng = np.random.default_rng(0)
P_SH, T_S, V, M_S, K, BLOCK = 2, 1024, 50, 8, 4, 64
tw = rng.integers(0, V, (P_SH, T_S)).astype(np.int32)
td = rng.integers(0, M_S, (P_SH, T_S)).astype(np.int32)
tm = np.ones((P_SH, T_S), np.int32)
dl = np.zeros((P_SH, M_S), np.int32)
for s in range(P_SH):
    dl[s] = np.bincount(td[s], minlength=M_S)
z0 = rng.integers(0, K, (P_SH, T_S)).astype(np.int32)
ndk0 = np.zeros((P_SH, M_S, K), np.int32)
nwk0 = np.zeros((V, K), np.int32)
for s in range(P_SH):
    np.add.at(ndk0[s], (td[s], z0[s]), 1)
    np.add.at(nwk0, (tw[s], z0[s]), 1)
nk0 = nwk0.sum(0).astype(np.int32)

mesh = Mesh(np.array(jax.devices()), ("data",))
shd = NamedSharding(mesh, P("data"))
rep = NamedSharding(mesh, P())

def put(x, sharding):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

jtw, jtd, jtm, jdl = (put(a, shd) for a in (tw, td, tm, dl))
jz, jndk = put(z0, shd), put(ndk0, shd)
jnwk, jnk = put(nwk0, rep), put(nk0, rep)
key = put(np.asarray(jax.random.PRNGKey(7)), rep)

def local(tw, td, tm, dl, z, ndk, nwk, nk, key):
    tw, td, tm, dl = tw[0], td[0], tm[0], dl[0]
    skey = jax.random.fold_in(key, lax.axis_index("data"))
    st = SamplerState(z=z[0], ndk=ndk[0], nwk=nwk, nk=nk, key=skey,
                      sweep=jnp.int32(0))
    new = gibbs_sweep(st, tw, td, tm, dl, alpha=0.5, beta=0.1,
                      block_size=BLOCK)
    # the AD-LDA reconciliation psum crosses the PROCESS boundary here
    nwk = nwk + lax.psum(new.nwk - nwk, "data")
    nk = nk + lax.psum(new.nk - nk, "data")
    return new.z[None], new.ndk[None], nwk, nk

fn = jax.jit(shard_map(
    local, mesh=mesh,
    in_specs=(P("data"),) * 6 + (P(), P(), P()),
    out_specs=(P("data"), P("data"), P(), P()),
    check_vma=False,
))
jz, jndk, jnwk, jnk = fn(jtw, jtd, jtm, jdl, jz, jndk, jnwk, jnk, key)

# gather the global z across processes and recount serially
z_all = np.asarray(multihost_utils.process_allgather(jz, tiled=True))
nwk_ref = np.zeros((V, K), np.int64)
for s in range(P_SH):
    np.add.at(nwk_ref, (tw[s], z_all[s]), 1)
# nwk is replicated: every process holds a full addressable copy
nwk_out = np.asarray(jnwk.addressable_shards[0].data)
assert nwk_out.shape == (V, K), nwk_out.shape
np.testing.assert_array_equal(nwk_out, nwk_ref)
assert (z_all != z0).any()
print(f"proc {pid} sweep ok")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(120)
def test_two_process_distributed_initialize(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip the TPU sitecustomize registration
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=90)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed rendezvous timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out


@pytest.mark.timeout(180)
def test_two_process_sharded_sweep(tmp_path):
    """Beyond rendezvous (VERDICT r2 weak #7): a real AD-LDA sweep runs over
    the global 2-device mesh, its psum reconciliation crossing the process
    boundary, and counts check out against a serial recount of the gathered
    global assignments."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SWEEP_WORKER, str(pid), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process sharded sweep timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} sweep ok" in out


_DEFERRED_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from ldagibbssampling_tpu.parallel.multihost import initialize_distributed
from ldagibbssampling_tpu.parallel.sharding import CorpusShards
from ldagibbssampling_tpu.parallel.adlda import deferred_shard_layout
from ldagibbssampling_tpu.models.state import SamplerState
from ldagibbssampling_tpu.ops.count_kernel import replicate_rows
from ldagibbssampling_tpu.ops.gibbs import deferred_local_counts

shard_map = jax.shard_map

pid = int(sys.argv[1]); coord = sys.argv[2]
initialize_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert len(jax.devices()) == 2

# identical host-side corpus + deferred layout in both processes (same seed)
rng = np.random.default_rng(0)
P_SH, T_S, V, M_S, K, BLOCK = 2, 1024, 50, 8, 4, 128
tw = rng.integers(0, V, (P_SH, T_S)).astype(np.int32)
td = np.sort(rng.integers(0, M_S, (P_SH, T_S)), axis=1).astype(np.int32)
tm = np.ones((P_SH, T_S), np.int32)
dl = np.zeros((P_SH, M_S), np.int32)
for s in range(P_SH):
    dl[s] = np.bincount(td[s], minlength=M_S)
shards = CorpusShards(token_word=tw, token_doc=td, token_mask=tm,
                      doc_lengths=dl,
                      doc_map=np.tile(np.arange(M_S, dtype=np.int32), (P_SH, 1)),
                      num_shards=P_SH, vocab_size=V,
                      num_real_tokens=P_SH * T_S)
layout_pair, reason = deferred_shard_layout(shards, BLOCK, K)
assert layout_pair is not None, reason
new_shards, lay = layout_pair
tw2, td2, tm2 = (new_shards.token_word, new_shards.token_doc,
                 new_shards.token_mask)

z0 = rng.integers(0, K, tw2.shape).astype(np.int32)
ndk0 = np.zeros((P_SH, M_S, K), np.int32)
nwk0 = np.zeros((V, K), np.int32)
for s in range(P_SH):
    real = tm2[s] > 0
    np.add.at(ndk0[s], (td2[s][real], z0[s][real]), 1)
    np.add.at(nwk0, (tw2[s][real], z0[s][real]), 1)
nk0 = nwk0.sum(0).astype(np.int32)

mesh = Mesh(np.array(jax.devices()), ("data",))
shd = NamedSharding(mesh, P("data"))
rep = NamedSharding(mesh, P())

def put(x, sharding):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

nt, tile = lay["num_tiles"], lay["tile"]
jtw, jtm = put(tw2, shd), put(tm2, shd)
jtdl, jd0 = put(lay["d_local"], shd), put(lay["d0"], shd)
jrg = put(lay["row_gather_idx"], shd)
jwl = put(lay["w_local"].reshape(P_SH, nt, tile), shd)
jts = put(lay["tile_stripe"], shd)
jz, jndk = put(z0, shd), put(ndk0, shd)
jnwk, jnk = put(nwk0, rep), put(nk0, rep)
key = put(np.asarray(jax.random.PRNGKey(7)), rep)

def local(tw, tm, tdl, d0, rg, wl, ts, z, ndk, nwk, nk, key):
    tw, tm, tdl = tw[0], tm[0], tdl[0]
    d0_, rg_, ts_ = d0[0], rg[0], ts[0]
    wl8 = replicate_rows(wl[0])
    skey = jax.random.fold_in(key, lax.axis_index("data"))
    st = SamplerState(z=z[0], ndk=ndk[0], nwk=nwk, nk=nk, key=skey,
                      sweep=jnp.int32(0))
    z2, ndk2, local_counts, _, _ = deferred_local_counts(
        st, tw, tdl, tm, d0_, rg_, wl8, ts_,
        jnp.float32(0.5), jnp.float32(0.1),
        block_size=lay["block_size"], d_loc=lay["d_loc"],
        row_tile=lay["row_tile"], noise_mode="external",
        pallas_interpret=True, vocab_size=None,
        v_loc=lay["v_loc"], v_pad=lay["v_pad"], tile=tile,
        slab_split=lay["slab_split"],
    )
    # global counts = psum of shard-local MXU rebuilds, ACROSS PROCESSES
    nwk2 = lax.psum(local_counts, "data").astype(nwk.dtype)
    nk2 = jnp.sum(nwk2, axis=0)
    return z2[None], ndk2[None], nwk2, nk2

fn = jax.jit(shard_map(
    local, mesh=mesh,
    in_specs=(P("data"),) * 7 + (P("data"), P("data"), P(), P(), P()),
    out_specs=(P("data"), P("data"), P(), P()),
    check_vma=False,
))
jz2, jndk2, jnwk2, jnk2 = fn(jtw, jtm, jtdl, jd0, jrg, jwl, jts,
                             jz, jndk, jnwk, jnk, key)

z_all = np.asarray(multihost_utils.process_allgather(jz2, tiled=True))
nwk_ref = np.zeros((V, K), np.int64)
for s in range(P_SH):
    real = tm2[s] > 0
    np.add.at(nwk_ref, (tw2[s][real], z_all[s][real]), 1)
nwk_out = np.asarray(jnwk2.addressable_shards[0].data)
np.testing.assert_array_equal(nwk_out, nwk_ref)
np.testing.assert_array_equal(
    np.asarray(jnk2.addressable_shards[0].data), nwk_ref.sum(0))
assert (z_all != z0).any()
print(f"proc {pid} deferred sweep ok")
"""


@pytest.mark.timeout(240)
def test_two_process_deferred_sweep(tmp_path):
    """The deferred tier's reconciliation — ``nwk = psum(local MXU
    rebuilds)`` — crossing a REAL process boundary (round-4 extension of
    the r3 two-process AD-LDA sweep), verified by serial recount of the
    gathered global assignments."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _DEFERRED_WORKER, str(pid), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("deferred two-process sweep timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} deferred sweep ok" in out


_GRID_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from ldagibbssampling_tpu.parallel.multihost import initialize_distributed
from ldagibbssampling_tpu.parallel.grid import shard_corpus_grid
from ldagibbssampling_tpu.corpus.flat import FlatCorpus
from ldagibbssampling_tpu.models.state import SamplerState
from ldagibbssampling_tpu.ops.gibbs import gibbs_sweep

shard_map = jax.shard_map

pid = int(sys.argv[1]); coord = sys.argv[2]
initialize_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
assert len(jax.devices()) == 2

# identical host-side corpus + grid layout in both processes (same seed)
rng = np.random.default_rng(3)
V, M, K, BLOCK = 60, 16, 4, 64
ragged = [[int(x) for x in rng.integers(0, V, size=40)] for _ in range(M)]
fc = FlatCorpus.from_ragged(ragged, vocab_size=V)
gs = shard_corpus_grid(fc, p_data=1, p_vocab=2, block_size=BLOCK)
PD, PV, TC = gs.token_word.shape
MS, VS = gs.docs_per_shard, gs.vocab_per_shard

z0 = rng.integers(0, K, gs.token_word.shape).astype(np.int32)
ndk0 = np.zeros((PD, MS, K), np.int32)
nwk0 = np.zeros((PV, VS, K), np.int32)
for i in range(PD):
    for j in range(PV):
        real = gs.token_mask[i, j] > 0
        np.add.at(ndk0[i], (gs.token_doc[i, j][real], z0[i, j][real]), 1)
        np.add.at(nwk0[j], (gs.token_word[i, j][real], z0[i, j][real]), 1)
nk0 = nwk0.sum(axis=(0, 1)).astype(np.int32)

mesh = Mesh(np.array(jax.devices()).reshape(1, 2), ("data", "vocab"))

def put(x, spec):
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

jtw = put(gs.token_word, P("data", "vocab"))
jtd = put(gs.token_doc, P("data", "vocab"))
jtm = put(gs.token_mask, P("data", "vocab"))
jdl = put(gs.doc_lengths, P("data"))
jz, jndk = put(z0, P("data", "vocab")), put(ndk0, P("data"))
jnwk, jnk = put(nwk0, P("vocab")), put(nk0, P())
key = put(np.asarray(jax.random.PRNGKey(11)), P())

def local(tw, td, tm, dl, z, ndk, nwk, nk, key):
    tw, td, tm = tw[0, 0], td[0, 0], tm[0, 0]
    dl = dl[0]
    i = lax.axis_index("data"); j = lax.axis_index("vocab")
    cell_key = jax.random.fold_in(jax.random.fold_in(key, i), j + (1 << 16))
    st = SamplerState(z=z[0, 0], ndk=ndk[0], nwk=nwk[0], nk=nk,
                      key=cell_key, sweep=jnp.int32(0))
    new = gibbs_sweep(st, tw, td, tm, dl, alpha=0.5, beta=0.1,
                      block_size=64, draw_method="gumbel", vocab_size=V)
    # the DPxTP reconciliation contract, ACROSS A REAL PROCESS BOUNDARY:
    # slab deltas psum over 'data', doc deltas psum over 'vocab' (each
    # doc's tokens are split across vocab columns), nk over both
    dnwk = lax.psum(new.nwk - st.nwk, "data")
    dndk = lax.psum(new.ndk - st.ndk, "vocab")
    dnk = lax.psum(new.nk - st.nk, ("data", "vocab"))
    return (new.z[None, None], (st.ndk + dndk)[None], (st.nwk + dnwk)[None],
            st.nk + dnk)

fn = jax.jit(shard_map(
    local, mesh=mesh,
    in_specs=(P("data", "vocab"), P("data", "vocab"), P("data", "vocab"),
              P("data"), P("data", "vocab"), P("data"), P("vocab"), P(), P()),
    out_specs=(P("data", "vocab"), P("data"), P("vocab"), P()),
    check_vma=False,
))
jz2, jndk2, jnwk2, jnk2 = fn(jtw, jtd, jtm, jdl, jz, jndk, jnwk, jnk, key)

z_all = np.asarray(multihost_utils.process_allgather(jz2, tiled=True))
nwk_all = np.asarray(multihost_utils.process_allgather(jnwk2, tiled=True))
ndk_ref = np.zeros((PD, MS, K), np.int64)
nwk_ref = np.zeros((PV, VS, K), np.int64)
for i in range(PD):
    for j in range(PV):
        real = gs.token_mask[i, j] > 0
        np.add.at(ndk_ref[i], (gs.token_doc[i, j][real], z_all[i, j][real]), 1)
        np.add.at(nwk_ref[j], (gs.token_word[i, j][real], z_all[i, j][real]), 1)
np.testing.assert_array_equal(nwk_all, nwk_ref)
np.testing.assert_array_equal(
    np.asarray(jndk2.addressable_shards[0].data)[0], ndk_ref[0])
np.testing.assert_array_equal(
    np.asarray(jnk2.addressable_shards[0].data), nwk_ref.sum(axis=(0, 1)))
assert (z_all != z0).any()
print(f"proc {pid} grid sweep ok")
"""


@pytest.mark.timeout(240)
def test_two_process_grid_sweep(tmp_path):
    """The DP×TP grid reconciliation — slab Δnwk psum'd over 'data', doc
    Δndk psum'd over 'vocab', nk over both — with the 'vocab' axis crossing
    a REAL process boundary (1×2 mesh, one device per process), verified by
    serial recount of the gathered global assignments."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _GRID_WORKER, str(pid), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("grid two-process sweep timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} grid sweep ok" in out
