"""Two-process smoke test for parallel.distributed.initialize: real
jax.distributed bring-up over localhost (the pod/multi-slice path's
process wiring), on the CPU backend.

Each worker initializes the distributed runtime, checks the global
topology (2 processes x 1 local device), builds the ('dp','sp') pod mesh
over the GLOBAL device list, and — where this jax build supports
cross-process CPU collectives (gloo) — runs a psum over dp to prove the
communication backend carries data between the processes."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import sys
    import jax

    # distributed.initialize must run before anything initializes the XLA
    # backend (platform choice comes from JAX_PLATFORMS=cpu in the env).
    # Load parallel/distributed.py directly by path: the package __init__
    # imports modules that build jnp constants, which would initialize the
    # backend prematurely.
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "crt_distributed",
        {repo!r} + "/cpu_raytracing_experiments_tpu/parallel/distributed.py",
    )
    distributed = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(distributed)

    addr, pid = sys.argv[1], int(sys.argv[2])
    distributed.initialize(
        coordinator_address=addr, num_processes=2, process_id=pid
    )
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        has_gloo = True
    except Exception:
        has_gloo = False
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()  # global device list
    assert len(jax.local_devices()) == 1

    mesh = distributed.pod_mesh(sp=1)
    assert mesh.devices.shape == (2, 1), mesh.devices.shape
    assert mesh.axis_names == ("dp", "sp")

    if has_gloo:
        import jax.numpy as jnp
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        def f(x):
            return jax.lax.psum(x, "dp")

        y = jax.jit(
            shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"))
        )(jnp.arange(2.0))
        # local shard of the psum result: sum over both processes' shards
        local = jax.local_devices()[0]
        vals = [s.data for s in y.addressable_shards]
        assert float(vals[0][0]) == 1.0, vals  # 0 + 1
        print("PSUM_OK", flush=True)
    print("TOPOLOGY_OK", flush=True)
    """
)


@pytest.mark.timeout(240)
def test_two_process_initialize(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize registers + initializes the TPU-tunnel backend
    # at interpreter startup when this is set, which forbids a later
    # jax.distributed.initialize(); the workers are pure-CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # the full suite runs under xla_force_host_platform_device_count=8;
    # inherited, each worker would see 8 local devices and the 2x1
    # topology asserts would fail — scrub just that token
    xf = " ".join(
        t for t in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in t
    )
    if xf:
        env["XLA_FLAGS"] = xf
    else:
        env.pop("XLA_FLAGS", None)

    # probe-then-rebind the coordinator port is inherently racy (another
    # process can grab it between our close and the coordinator's bind),
    # so retry the whole bring-up on a fresh port
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        addr = f"localhost:{port}"
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), addr, str(i)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=220)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("distributed worker timed out")
            outs.append((p.returncode, out, err))
        if all(rc == 0 for rc, _, _ in outs) or attempt == 2:
            break
    if any(rc != 0 for rc, _, _ in outs):
        # triage: coordinator/connect timeouts are environmental (this box
        # has one core; a concurrently-running suite can starve the
        # bring-up past jax's internal deadlines) — skip rather than fail;
        # anything else (topology/psum asserts) is a real regression
        blob = " ".join(err for _, _, err in outs)
        env_markers = ("DEADLINE_EXCEEDED", "UNAVAILABLE", "timed out",
                       "Timed out", "barrier", "Connection refused")
        if any(m in blob for m in env_markers):
            pytest.skip("distributed bring-up timed out under load")
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "TOPOLOGY_OK" in out, (out, err[-500:])
