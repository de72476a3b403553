"""Parallelism tests on the 8-device virtual CPU mesh.

Verifies the two TPU scaling paths (SURVEY.md §2.3): tensor-parallel
sharding must be numerically transparent (same logits as single-device),
and the replica pool must dispatch across per-device engines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wis_tpu.models.whisper.config import WhisperConfig
from wis_tpu.models.whisper.model import DecoderCache, cross_kv, encode, prefill
from wis_tpu.models.whisper.tokenizer import SOT
from wis_tpu.models.whisper.weights import random_params
from wis_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_params,
    shard_params,
    whisper_param_specs,
)
from wis_tpu.parallel.replicas import ReplicaPool
from wis_tpu.runtime.batcher import ASRRequest
from wis_tpu.settings import APISettings

CFG = WhisperConfig(
    name="micro-tp",
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def _forward(params, mel):
    xa = encode(params, mel, CFG)
    xa_kv = cross_kv(params, xa, CFG)
    cache = DecoderCache.zeros(CFG, mel.shape[0], 4, jnp.float32)
    sot = jnp.full((mel.shape[0], 1), SOT, jnp.int32)
    logits, _ = prefill(params, sot, cache, xa_kv, CFG)
    return logits[:, -1]


def test_tensor_parallel_matches_single_device():
    params = random_params(CFG, seed=3, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)), jnp.float32)

    ref = np.asarray(jax.jit(_forward)(params, mel))

    mesh = make_mesh(n_data=1, n_model=4)
    specs = whisper_param_specs(CFG, tensor_parallel=True)
    sharded = shard_params(params, mesh, specs)
    got = np.asarray(jax.jit(_forward)(sharded, mel))

    np.testing.assert_allclose(ref, got, atol=2e-3, rtol=1e-3)


def test_data_parallel_batch_sharding():
    params = random_params(CFG, seed=4, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    mel_np = rng.standard_normal((8, 80, 3000)).astype(np.float32)

    ref = np.asarray(jax.jit(_forward)(params, jnp.asarray(mel_np)))

    mesh = make_mesh(n_data=8, n_model=1)
    repl = replicate_params(params, mesh)
    mel = jax.device_put(jnp.asarray(mel_np), batch_sharding(mesh))
    got = np.asarray(jax.jit(_forward)(repl, mel))

    np.testing.assert_allclose(ref, got, atol=2e-3, rtol=1e-3)


def test_dp_tp_composed_mesh():
    params = random_params(CFG, seed=5, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    mel_np = rng.standard_normal((2, 80, 3000)).astype(np.float32)

    ref = np.asarray(jax.jit(_forward)(params, jnp.asarray(mel_np)))

    mesh = make_mesh(n_data=2, n_model=4)
    sharded = shard_params(params, mesh, whisper_param_specs(CFG))
    mel = jax.device_put(
        jnp.asarray(mel_np), NamedSharding(mesh, P("data", None, None))
    )
    got = np.asarray(jax.jit(_forward)(sharded, mel))

    np.testing.assert_allclose(ref, got, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_replica_pool_dispatch():
    settings = APISettings(
        max_decode_tokens=4,
        batch_window_s=0.01,
        whisper_model_default="tiny",
    )
    pool = ReplicaPool(settings, devices=jax.devices()[:2])
    rng = np.random.default_rng(0)
    reqs = [
        ASRRequest(
            audio=(rng.standard_normal(8000) * 0.05).astype(np.float32),
            model="tiny",
            beam_size=1,
        )
        for _ in range(4)
    ]
    futures = [pool.submit(r) for r in reqs]
    results = [f.result(timeout=300) for f in futures]
    assert len(results) == 4
    assert all(r.audio_duration_ms == 500 for r in results)
    pool.shutdown()


def test_tensor_parallel_with_int8_params():
    """TP sharding must compose with int8 quantization: the quantized
    {"q","s"} leaves inherit the weight's column/row sharding."""
    from wis_tpu.ops.quant import quantize_whisper_params

    params = random_params(CFG, seed=6, dtype=jnp.float32)
    qparams = quantize_whisper_params(params, subtrees=("encoder", "decoder"))
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 80, 3000)), jnp.float32)

    ref = np.asarray(jax.jit(_forward)(qparams, mel))

    mesh = make_mesh(n_data=1, n_model=4)
    sharded = shard_params(qparams, mesh, whisper_param_specs(CFG))
    got = np.asarray(jax.jit(_forward)(sharded, mel))

    np.testing.assert_allclose(ref, got, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_server_replica_pool_mode():
    """create_app with replica_pool auto on a multi-device host builds a
    per-chip pool behind the same endpoint surface."""
    import asyncio
    import io
    import wave

    from aiohttp.test_utils import TestClient, TestServer

    from wis_tpu.server.app import create_app

    settings = APISettings(
        max_decode_tokens=4,
        whisper_model_default="tiny",
        replica_pool="auto",
        batch_window_s=0.01,
    )

    async def go():
        app = create_app(settings=settings)  # no engine → pool path
        from wis_tpu.parallel.replicas import ReplicaPool

        assert isinstance(app["executor"], ReplicaPool)
        assert len(app["executor"].executors) == 8
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            import aiohttp
            import numpy as np

            pcm = (np.zeros(8000, np.float32) * 32767).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
            form = aiohttp.FormData()
            form.add_field("audio_file", buf.getvalue(), filename="a.wav")
            resp = await client.post("/api/asr?model=tiny&beam_size=1", data=form)
            assert resp.status == 200
            resp = await client.get("/api/status")
            assert resp.status == 200
        finally:
            await client.close()

    asyncio.run(go())
