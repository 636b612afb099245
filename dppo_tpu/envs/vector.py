"""Vectorized environment pools — the host-side simulation fabric.

Capability parity with the reference's only distributed system
(`env/gym_utils/async_vector_env.py:56` AsyncVectorEnv +
`sync_vector_env.py:15` SyncVectorEnv): lockstep `step`, per-env seeding,
per-env reset options (`reset_arg:687`, `reset_one_arg:696`), synchronous
method calls across envs (`call_sync:663`), render passthrough, and worker
error propagation (`error_queue`, `_raise_if_errors:640`).

Re-designed for the TPU host model instead of translated: the reference
spawns ONE OS PROCESS PER ENV and ships observations through POSIX shared
memory. Here N envs are *sharded over W worker processes* (W defaults to the
host's CPU count), each worker stepping its shard serially — same lockstep
semantics, far fewer processes/pipes, and the learner host only ever sees
one stacked numpy batch. Exceeds the reference with automatic worker
respawn on crash (the reference kills the run, SURVEY §5.3).
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import os
import traceback
from typing import Any, Callable, Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)


def _stack_obs(obs_list: Sequence[Any]):
    if isinstance(obs_list[0], dict):
        return {
            k: np.stack([o[k] for o in obs_list]) for k in obs_list[0].keys()
        }
    return np.stack(obs_list)


class SyncVectorEnv:
    """Serial lockstep pool; also the per-worker shard of AsyncVectorEnv."""

    def __init__(self, env_fns: Sequence[Callable[[], Any]]):
        self.envs = [fn() for fn in env_fns]
        self.n_envs = len(self.envs)
        self._pending_actions = None

    def seed(self, seeds: Sequence[int]):
        for env, s in zip(self.envs, seeds):
            env.seed(s)

    def reset_arg(self, options_list: Optional[Sequence[dict]] = None):
        options_list = options_list or [{} for _ in range(self.n_envs)]
        return _stack_obs(
            [env.reset(options=o) for env, o in zip(self.envs, options_list)]
        )

    def reset_one_arg(self, env_ind: int, options: Optional[dict] = None):
        return self.envs[env_ind].reset(options=options or {})

    def reset(self):
        return self.reset_arg()

    def step(self, actions: np.ndarray):
        results = [env.step(a) for env, a in zip(self.envs, actions)]
        obs, rews, terms, truncs, infos = zip(*results)
        return (
            _stack_obs(obs),
            np.asarray(rews, dtype=np.float32),
            np.asarray(terms, dtype=bool),
            np.asarray(truncs, dtype=bool),
            list(infos),
        )

    # split-phase step: lets the caller overlap host work (e.g. fetching the
    # denoising chain off-device) with simulator stepping. Serial pool has no
    # real concurrency, so step_async just stashes the actions.
    def step_async(self, actions: np.ndarray):
        if self._pending_actions is not None:
            raise RuntimeError("step_async called with a step already pending")
        self._pending_actions = actions

    def step_wait(self):
        if self._pending_actions is None:
            raise RuntimeError("step_wait called without a pending step_async")
        actions = self._pending_actions
        self._pending_actions = None
        return self.step(actions)

    def call_sync(self, name: str, *args, **kwargs):
        return [getattr(env, name)(*args, **kwargs) for env in self.envs]

    def call_sync_arg(self, name: str, arg_list):
        return [
            getattr(env, name)(arg) for env, arg in zip(self.envs, arg_list)
        ]

    def render(self):
        return [env.render() for env in self.envs]

    def close(self):
        for env in self.envs:
            env.close()


def _flatten_state(obs):
    """Extract the dense "state" modality for shm transport; returns
    (state_array or None, obs_without_state)."""
    if isinstance(obs, dict) and "state" in obs:
        rest = {k: v for k, v in obs.items() if k != "state"}
        return obs["state"], rest
    return None, obs


def _worker(pipe, env_fns_bytes, shm_name=None, shm_bytes=0):
    import pickle

    seg = None
    try:
        env_fns = pickle.loads(env_fns_bytes)
        shard = SyncVectorEnv(env_fns)
        if shm_name is not None:
            from dppo_tpu.native import ShmSegment

            seg = ShmSegment(shm_name, shm_bytes, create=False)
        pipe.send(("ready", None))
    except Exception:
        pipe.send(("error", traceback.format_exc()))
        return
    while True:
        try:
            cmd, payload = pipe.recv()
            if cmd == "close":
                shard.close()
                pipe.send(("ok", None))
                break
            fn = getattr(shard, cmd)
            result = fn(*payload[0], **payload[1])
            if seg is not None and cmd in ("step", "reset_arg", "reset"):
                # publish the dense obs through shared memory; keep the rest
                # of the tuple (and non-state modalities) on the pipe
                if cmd == "step":
                    obs, rews, terms, truncs, infos = result
                    state, rest = _flatten_state(obs)
                    if state is not None:
                        seg.write(np.ascontiguousarray(state, np.float32))
                        result = (("__shm__", rest), rews, terms, truncs, infos)
                else:
                    state, rest = _flatten_state(result)
                    if state is not None:
                        seg.write(np.ascontiguousarray(state, np.float32))
                        result = ("__shm__", rest)
            pipe.send(("ok", result))
        except EOFError:
            break
        except Exception:
            pipe.send(("error", traceback.format_exc()))


class AsyncVectorEnv:
    """N envs sharded over W worker processes, lockstep API identical to
    SyncVectorEnv. Worker crashes raise on the caller with the remote
    traceback; `respawn=True` rebuilds a dead worker's shard instead."""

    def __init__(
        self,
        env_fns: Sequence[Callable[[], Any]],
        n_workers: Optional[int] = None,
        respawn: bool = True,
        context: str = "fork",
        use_shm: bool = False,
        shm_state_shape: Optional[tuple] = None,
    ):
        """use_shm: publish the dense "state" modality through the native
        POSIX shared-memory transport (dppo_tpu/native) instead of pickling
        it over the pipe — the reference's shared-memory observation path
        (async_vector_env.py:163-184). Requires `shm_state_shape`, the
        per-env stacked-obs shape (e.g. (To, Do))."""
        import pickle

        self.n_envs = len(env_fns)
        n_workers = min(n_workers or mp.cpu_count(), self.n_envs)
        self.n_workers = n_workers
        self._ctx = mp.get_context(context)
        # contiguous shards, as even as possible
        base, extra = divmod(self.n_envs, n_workers)
        sizes = [base + (1 if w < extra else 0) for w in range(n_workers)]
        self._bounds = np.cumsum([0] + sizes)
        self._fn_bytes = [
            pickle.dumps(list(env_fns[self._bounds[w] : self._bounds[w + 1]]))
            for w in range(n_workers)
        ]
        self.respawn = respawn
        self._use_shm = use_shm
        self._segments: list = [None] * n_workers
        self._shm_names: list = [None] * n_workers
        self._state_shape = tuple(shm_state_shape) if shm_state_shape else None
        if use_shm:
            assert self._state_shape is not None, "use_shm needs shm_state_shape"
            from dppo_tpu.native import ShmSegment

            for w in range(n_workers):
                n_local = int(self._bounds[w + 1] - self._bounds[w])
                nbytes = int(
                    np.prod((n_local,) + self._state_shape) * 4
                )
                name = f"/dppo_obs_{os.getpid()}_{id(self)}_{w}"
                self._segments[w] = ShmSegment(name, nbytes, create=True)
                self._shm_names[w] = name
        self._pipes: list = [None] * n_workers
        self._procs: list = [None] * n_workers
        self._waiting = False
        for w in range(n_workers):
            self._spawn(w)

    def _spawn(self, w: int):
        parent, child = self._ctx.Pipe()
        shm_name = self._shm_names[w] if self._use_shm else None
        shm_bytes = self._segments[w].nbytes if self._use_shm else 0
        proc = self._ctx.Process(
            target=_worker,
            args=(child, self._fn_bytes[w], shm_name, shm_bytes),
            daemon=True,
        )
        proc.start()
        child.close()
        status, payload = parent.recv()
        if status == "error":
            raise RuntimeError(f"env worker {w} failed to boot:\n{payload}")
        self._pipes[w] = parent
        self._procs[w] = proc

    def _send_all(self, cmd: str, per_worker_args=None, kwargs=None):
        if self._waiting:
            # a step_async reply is still in flight; pairing a new command's
            # recv with the stale replies would desync the pipe protocol
            raise RuntimeError(
                f"cannot send {cmd!r} while a step_async is pending; call "
                "step_wait first"
            )
        kwargs = kwargs or {}
        for w, pipe in enumerate(self._pipes):
            args = per_worker_args[w] if per_worker_args is not None else ()
            pipe.send((cmd, (args, kwargs)))

    def _recv_all(self):
        results = []
        for w, pipe in enumerate(self._pipes):
            try:
                status, payload = pipe.recv()
            except (EOFError, ConnectionResetError):
                status, payload = "dead", "worker pipe closed"
            if status != "ok":
                if self.respawn:
                    log.warning(
                        "env worker %d failed (%s); respawning shard", w, payload
                    )
                    try:
                        self._procs[w].terminate()
                    except Exception:
                        pass
                    self._spawn(w)
                    raise RuntimeError(
                        f"env worker {w} crashed and was respawned; caller "
                        f"must reset. Remote error:\n{payload}"
                    )
                raise RuntimeError(f"env worker {w} error:\n{payload}")
            results.append(payload)
        return results

    def _call_all(self, cmd: str, per_worker_args=None, kwargs=None):
        self._send_all(cmd, per_worker_args, kwargs)
        return self._recv_all()

    def _shard(self, arr):
        return [
            arr[self._bounds[w] : self._bounds[w + 1]]
            for w in range(self.n_workers)
        ]

    def seed(self, seeds: Sequence[int]):
        self._call_all("seed", [(list(s),) for s in self._shard(list(seeds))])

    def reset_arg(self, options_list: Optional[Sequence[dict]] = None):
        options_list = options_list or [{} for _ in range(self.n_envs)]
        shards = self._call_all(
            "reset_arg", [(s,) for s in self._shard(list(options_list))]
        )
        return self._merge_obs(shards)

    def reset_one_arg(self, env_ind: int, options: Optional[dict] = None):
        if self._waiting:
            raise RuntimeError(
                "cannot reset_one_arg while a step_async is pending"
            )
        w = int(np.searchsorted(self._bounds, env_ind, side="right") - 1)
        local = env_ind - self._bounds[w]
        pipe = self._pipes[w]
        pipe.send(("reset_one_arg", ((local, options or {}), {})))
        status, payload = pipe.recv()
        if status != "ok":
            raise RuntimeError(f"env worker {w} error:\n{payload}")
        return payload

    def reset(self):
        return self.reset_arg()

    def step(self, actions: np.ndarray):
        self.step_async(actions)
        return self.step_wait()

    def step_async(self, actions: np.ndarray):
        """Dispatch the step to all workers and return immediately — the
        simulators run while the caller does host work (e.g. device→host
        chain fetch, buffer writes). Collect with `step_wait`."""
        self._send_all("step", [(s,) for s in self._shard(actions)])
        self._waiting = True

    def step_wait(self):
        if not self._waiting:
            raise RuntimeError("step_wait called without a pending step_async")
        self._waiting = False  # cleared even if a worker error raises below
        shards = self._recv_all()
        obs = self._merge_obs([s[0] for s in shards])
        rews = np.concatenate([s[1] for s in shards])
        terms = np.concatenate([s[2] for s in shards])
        truncs = np.concatenate([s[3] for s in shards])
        infos = [i for s in shards for i in s[4]]
        return obs, rews, terms, truncs, infos

    def call_sync(self, name: str, *args, **kwargs):
        shards = self._call_all(
            "call_sync", [(name, *args) for _ in range(self.n_workers)], kwargs
        )
        return [r for s in shards for r in s]

    def render(self):
        shards = self._call_all("render")
        return [r for s in shards for r in s]

    def _merge_obs(self, shard_obs):
        # resolve shm-published dense states first
        if self._use_shm and isinstance(shard_obs[0], tuple) and (
            len(shard_obs[0]) == 2 and shard_obs[0][0] == "__shm__"
        ):
            merged = {}
            states = []
            for w, (_, rest) in enumerate(shard_obs):
                n_local = int(self._bounds[w + 1] - self._bounds[w])
                out = np.empty((n_local,) + self._state_shape, np.float32)
                self._segments[w].read(out)
                states.append(out)
                for k, v in rest.items():
                    merged.setdefault(k, []).append(v)
            result = {"state": np.concatenate(states)}
            for k, vs in merged.items():
                result[k] = np.concatenate(vs)
            return result
        if isinstance(shard_obs[0], dict):
            return {
                k: np.concatenate([s[k] for s in shard_obs])
                for k in shard_obs[0].keys()
            }
        return np.concatenate(shard_obs)

    def close(self):
        for seg in getattr(self, "_segments", []):
            if seg is not None:
                seg.close()
        for pipe in self._pipes:
            try:
                pipe.send(("close", ((), {})))
            except Exception:
                pass
        for proc in self._procs:
            proc.join(timeout=5)
            if proc.is_alive():
                proc.terminate()
