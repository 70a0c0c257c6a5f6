"""Continuous-batching decode engine: persistent lanes, segment decoding,
recompile-free admission.

The reference decodes each batch to completion with left-pad batching
(reference components/llm.py:368-459) — short generations wait for the
longest. This engine is the TPU-idiomatic upgrade (SURVEY.md section 7.4
item 3, BASELINE.json configs[4] "continuous-batched LLM generation"):

- a fixed pool of `lanes` decode slots shares one static-shape KV cache
  [L, lanes, S, Hkv, Dh] — shapes never change, so XLA compiles exactly
  two programs: prefill-and-scatter (per admit/prefill bucket) and an
  8-step decode segment;
- new requests are admitted into free lanes *between segments*: prompt KV
  is computed in a bucketed prefill and scattered into the lane cache;
- finished lanes (eos / length cap) free up every segment boundary, so a
  short generation never waits on a long one.

The async wrapper exposes `submit(prompt_ids) -> future(tokens)`; the
engine loop drains admissions and runs segments while any lane is live.
"""

from __future__ import annotations

import asyncio
import functools
import logging
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import KVCache
from ..models.qwen import (
    QwenConfig,
    bigram_draft,
    param_compute_dtype,
    qwen_decode_step,
    qwen_extend,
    qwen_prefill,
)
from ..utils.shapes import pick_bucket

logger = logging.getLogger(__name__)


# -- jitted cores ----------------------------------------------------------


def _admit_impl(
    params,
    cache: KVCache,  # [L, lanes, S, ...] pool cache (donated)
    tokens,  # [lanes] last token per lane
    done,  # [lanes] bool
    emit_buf,  # [lanes, emit_cap] i32 device-resident emissions (donated)
    prompt_ids,  # [A, P] right-padded admit bucket
    prompt_mask,  # [A, P]
    lane_ids,  # [A] target lanes
    *,
    cfg: QwenConfig,
    eos: int,
):
    """Prefill the admitted prompts and scatter KV + state into their lanes."""
    a, p = prompt_ids.shape
    s = cache.k.shape[2]
    mini = KVCache.zeros(
        cfg.layers, a, s, cfg.kv_heads, cfg.head_dim, dtype=cache.k.dtype
    )
    logits, mini = qwen_prefill(params, cfg, prompt_ids, prompt_mask, mini)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # padding rows carry an out-of-range lane id and are dropped by the
    # scatter — no spare lane needed, no duplicate-index hazards
    k = cache.k.at[:, lane_ids].set(mini.k, mode="drop")
    v = cache.v.at[:, lane_ids].set(mini.v, mode="drop")
    length = cache.length.at[lane_ids].set(mini.length, mode="drop")
    tokens = tokens.at[lane_ids].set(first, mode="drop")
    done = done.at[lane_ids].set(first == eos, mode="drop")
    emit_buf = emit_buf.at[lane_ids, 0].set(first, mode="drop")
    return KVCache(k=k, v=v, length=length), tokens, done, emit_buf


_admit = functools.partial(
    jax.jit, static_argnames=("cfg", "eos"), donate_argnums=(1, 4)
)(_admit_impl)


@functools.partial(
    jax.jit, static_argnames=("cfg", "eos", "pcap"), donate_argnums=(1, 4)
)
def _admit_spec(
    params,
    cache: KVCache,  # donated
    tokens,
    done,
    emit_buf,  # donated
    prompt_ids,  # [A, P]
    prompt_mask,  # [A, P]
    lane_ids,  # [A]
    counts,  # [lanes] i32 committed-token counts (NOT donated: pipelined
    #          _process_done may still be fetching the previous array)
    limits,  # [lanes] i32 per-lane max_new_tokens
    prompts,  # [lanes, pcap] i32 draft-source prompt rows
    prompt_len,  # [lanes] i32
    max_new,  # [A] i32
    *,
    cfg: QwenConfig,
    eos: int,
    pcap: int,
):
    """Speculative-mode admit: plain admit + scatter the per-lane draft
    context (prompt rows, lengths) and emission accounting (counts, limits)
    that the speculative segments keep device-resident."""
    cache, tokens, done, emit_buf = _admit_impl(
        params, cache, tokens, done, emit_buf,
        prompt_ids, prompt_mask, lane_ids, cfg=cfg, eos=eos,
    )
    a, p = prompt_ids.shape
    padded = jnp.pad(prompt_ids, ((0, 0), (0, pcap - p)))
    prompts = prompts.at[lane_ids].set(padded, mode="drop")
    plen = jnp.sum(prompt_mask, axis=1).astype(jnp.int32)
    prompt_len = prompt_len.at[lane_ids].set(plen, mode="drop")
    counts = counts.at[lane_ids].set(1, mode="drop")
    limits = limits.at[lane_ids].set(max_new, mode="drop")
    return cache, tokens, done, emit_buf, counts, limits, prompts, prompt_len


@functools.partial(
    jax.jit, static_argnames=("cfg", "steps", "eos"), donate_argnums=(1, 4)
)
def _segment(
    params,
    cache: KVCache,  # donated
    tokens,
    done,
    emit_buf,  # [lanes, emit_cap] i32 (donated) — emissions stay on device
    offsets,  # [lanes] i32 write offsets (host-tracked counts)
    *,
    cfg: QwenConfig,
    steps: int,
    eos: int,
):
    """Decode `steps` tokens for every lane, appending into the device
    emission buffer. Only `done` needs fetching per segment; token rows are
    pulled once per completed request (one small transfer instead of every
    emitted token every segment)."""
    s = cache.k.shape[2]

    def body(carry, _):
        cache, tokens, done = carry
        logits, cache = qwen_decode_step(params, cfg, tokens, cache)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos, nxt)
        done = jnp.logical_or(done, nxt == eos)
        done = jnp.logical_or(done, cache.length >= s - 1)
        return (cache, nxt, done), nxt

    (cache, tokens, done), emitted = jax.lax.scan(
        body, (cache, tokens, done), None, length=steps
    )
    emitted = emitted.T  # [lanes, steps]
    cap = emit_buf.shape[1]
    safe = jnp.clip(offsets, 0, cap - steps)
    emit_buf = jax.vmap(
        lambda row, em, off: jax.lax.dynamic_update_slice(row, em, (off,))
    )(emit_buf, emitted, safe)
    return cache, tokens, done, emit_buf


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "rounds", "gamma", "eos", "inject_accept_p"),
    # counts ([lanes] i32) is NOT donated: with pipelined dispatch the
    # previous segment's counts array is still awaiting its _process_done
    # fetch when the next segment runs — donation would delete it
    donate_argnums=(1, 4),
)
def _segment_spec(
    params,
    cache: KVCache,  # donated
    tokens,  # [lanes] last committed token
    done,  # [lanes] bool
    emit_buf,  # [lanes, W] i32 (donated)
    counts,  # [lanes] i32 committed-token counts (NOT donated — see the
    #          donate_argnums comment above)
    limits,  # [lanes] i32 per-lane max_new_tokens
    prompts,  # [lanes, pcap] i32 draft-source prompt rows
    prompt_len,  # [lanes] i32
    it0,  # scalar i32 — verify-round counter base (inject-mode keys)
    *,
    cfg: QwenConfig,
    rounds: int,
    gamma: int,
    eos: int,
    inject_accept_p: Optional[float] = None,
):
    """Speculative decode segment: `rounds` verify windows per lane instead
    of per-token steps (round-2 VERDICT #6 — engine + speculation compose).

    Each round drafts `gamma` tokens per lane by bigram prompt lookup
    (models/qwen.py::bigram_draft — RAG answers quote their context, so
    prompt-lookup acceptance is high on the reference workload, reference
    llm.py:343-350), verifies all lanes with ONE qwen_extend call (gamma+1
    extra MXU columns ride along nearly free on a weight-bound decode), and
    commits the per-lane accepted prefix into the device emission buffer.
    Commit counts vary per lane per round, so emission offsets (`counts`)
    are device-resident and fetched with `done` once per segment — the
    host-tracked `written` bookkeeping of the plain segment does not apply.

    Committed tokens are always the model's own greedy argmaxes — token
    output is identical to greedy_generate (tested). inject_accept_p
    replaces the accept decision with a Bernoulli(p) draw for the
    acceptance->latency curve (benchmark-only; same device cost per round,
    commits no longer greedy-identical — see ngram_speculative_generate).
    """
    lanes = tokens.shape[0]
    s = cache.k.shape[2]
    w = emit_buf.shape[1]
    draft_fn = functools.partial(bigram_draft, gamma=gamma)
    lane_iota = jnp.arange(lanes, dtype=jnp.int32)

    for r in range(rounds):
        prev = jnp.where(
            counts >= 2,
            emit_buf[lane_iota, jnp.maximum(counts - 2, 0)],
            tokens,
        )
        drafts = jax.vmap(draft_fn)(
            prompts, prompt_len, jnp.stack([prev, tokens], axis=1)
        )  # [lanes, gamma]
        window = jnp.concatenate([tokens[:, None], drafts], axis=1)
        logits, ext = qwen_extend(params, cfg, window, cache)
        targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [lanes, g+1]
        if inject_accept_p is not None:
            kit = jax.random.fold_in(jax.random.key(0), it0 + r)
            ok = jax.random.uniform(kit, (lanes, gamma)) < inject_accept_p
        else:
            ok = drafts == targets[:, :-1]
        n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)
        j = jnp.arange(gamma + 1, dtype=jnp.int32)[None]
        within = j <= n_acc[:, None]
        is_eos = (targets == eos) & within
        any_eos = jnp.any(is_eos, axis=1)
        eos_at = jnp.argmax(is_eos, axis=1)
        commit = jnp.where(any_eos, eos_at + 1, n_acc + 1)
        commit = jnp.where(done, 0, commit)
        commit = jnp.minimum(commit, jnp.maximum(limits - counts, 0))
        any_eos = jnp.logical_and(any_eos, ~done)

        # targets[0..commit) -> emit_buf[lane, counts..]; masked writes land
        # on the scratch column w-1 (never a real slot: counts stays < limits
        # <= cache_len - 2 < w - 1)
        def write(row, tgt, start, cnt):
            for jj in range(gamma + 1):
                dst = jnp.where(jj < cnt, start + jj, w - 1)
                row = jax.lax.dynamic_update_slice(row, tgt[jj : jj + 1], (dst,))
            return row

        emit_buf = jax.vmap(write)(emit_buf, targets, counts, commit)
        # roll the cache back to the committed prefix (stale KV beyond
        # `length` is never attended; qwen_extend advanced it by gamma+1)
        new_len = cache.length + jnp.minimum(commit, n_acc + 1)
        cache = KVCache(k=ext.k, v=ext.v, length=new_len)
        new_last = targets[lane_iota, jnp.clip(commit - 1, 0, gamma)]
        tokens = jnp.where(commit > 0, new_last, tokens)
        counts = counts + commit
        # the s - (gamma+1) guard keeps the NEXT round's extend window
        # in-bounds (dynamic_update_slice would clamp and overwrite live KV)
        done = (
            done
            | any_eos
            | (counts >= limits)
            | (new_len >= s - (gamma + 1))
        )
    return cache, tokens, done, emit_buf, counts


# -- engine ----------------------------------------------------------------


@dataclass
class _Request:
    prompt_ids: np.ndarray  # [P] unpadded
    max_new_tokens: int
    future: asyncio.Future
    lane: int = -1
    written: int = 0  # device emission-buffer fill (host-tracked)


class DecodeEngine:
    """Async continuous-batching wrapper around the jitted cores."""

    def __init__(
        self,
        params,
        cfg: QwenConfig,
        *,
        lanes: int = 8,
        cache_len: int = 512,
        segment_steps: int = 8,
        eos_token_id: int = 2,
        admit_buckets: tuple[int, ...] = (1, 2, 4, 8),
        prefill_buckets: tuple[int, ...] = (64, 128, 256),
        pipeline_segments: bool = True,
        mesh=None,  # MeshContext: TP-shard the lane KV pool with the params
        speculative: bool = False,
        gamma: int = 8,
        spec_rounds: int = 2,
        inject_accept_p: Optional[float] = None,  # benchmark-only (see _segment_spec)
    ) -> None:
        # pipeline_segments: dispatch segment N+1 before the host has seen
        # segment N's `done` flags (the fetch rides alongside the next
        # segment's execution). Completion detection lags one segment —
        # the device never idles on the host round-trip, which is the RTT
        # tax that lost the round-1 A/B through the tunnel (PERF_NOTES.md
        # "Continuous-batching engine"). Correctness is unaffected: a
        # done lane emits eos, collects are n-clipped, and freed lanes are
        # only re-admitted after their completion is processed.
        self.pipeline_segments = pipeline_segments
        self.params = params
        self.cfg = cfg
        self.lanes = lanes
        self.cache_len = cache_len
        self.segment_steps = segment_steps
        self.eos = eos_token_id
        self.admit_buckets = tuple(b for b in admit_buckets if b <= lanes) or (1,)
        self.prefill_buckets = prefill_buckets
        self.speculative = speculative
        self.gamma = gamma
        self.spec_rounds = spec_rounds
        self.inject_accept_p = inject_accept_p
        # Prometheus: lane occupancy + emitted tokens (Grafana engine row)
        from ..core.config import get_settings
        from ..telemetry.metrics import (
            ENGINE_LANES_ACTIVE,
            ENGINE_SEGMENTS,
            TOKENS_GENERATED,
        )

        _s = get_settings()
        _lbl = (_s.run_id, str(_s.node_number))
        self._m_lanes = ENGINE_LANES_ACTIVE.labels(*_lbl)
        self._m_segments = ENGINE_SEGMENTS.labels(*_lbl)
        self._m_tokens = TOKENS_GENERATED.labels(*_lbl)
        # speculative segments place a gamma+1 verify window before rollback;
        # the extra headroom keeps logical capacity equal to plain mode
        s_alloc = cache_len + (gamma + 1 if speculative else 0)
        self.cache = KVCache.zeros(
            cfg.layers, lanes, s_alloc, cfg.kv_heads, cfg.head_dim,
            dtype=jnp.bfloat16
            if param_compute_dtype(params) == jnp.bfloat16
            else jnp.float32,
        )
        if mesh is not None and mesh.n_devices > 1:
            # lane KV pool sharded like the params: kv heads over tp, lanes
            # over dp (parallel/sharding.py::kv_cache_sharding). The jitted
            # cores carry the sharding through scan/scatter so the engine's
            # decode step runs TP over ICI — the serving-path TP the round-2
            # VERDICT flagged as missing (#1a). GQA bound: tp <= kv_heads.
            from ..parallel.sharding import kv_cache_sharding

            kv_sh = kv_cache_sharding(mesh)
            repl = mesh.replicated
            self.cache = KVCache(
                k=jax.device_put(self.cache.k, kv_sh),
                v=jax.device_put(self.cache.v, kv_sh),
                length=jax.device_put(self.cache.length, repl),
            )
        self.tokens = jnp.zeros((lanes,), jnp.int32)
        self.done = jnp.ones((lanes,), bool)
        # + segment_steps headroom: the final segment may overrun written by
        # up to steps-1 positions; without it the offset clip in _segment
        # would shift the last write left over valid tokens
        self.emit_buf = jnp.zeros(
            (lanes, cache_len + max(segment_steps, gamma + 2)), jnp.int32
        )
        if speculative:
            # device-resident emission accounting + draft context: commit
            # counts vary per lane per verify round, so offsets cannot be
            # host-tracked like the plain segment's `written`
            self.counts = jnp.zeros((lanes,), jnp.int32)
            self.limits = jnp.zeros((lanes,), jnp.int32)
            self._pcap = cache_len
            self.prompts = jnp.zeros((lanes, self._pcap), jnp.int32)
            self.prompt_len = jnp.zeros((lanes,), jnp.int32)
            self._spec_it = 0
        self._lane_req: list[Optional[_Request]] = [None] * lanes
        self._waiting: asyncio.Queue[_Request] = asyncio.Queue()
        self._loop_task: Optional[asyncio.Task] = None
        self._wake = asyncio.Event()
        self._stopped = False

    # -- public API --------------------------------------------------------
    async def start(self) -> None:
        if self._loop_task is None:
            self._loop_task = asyncio.create_task(self._run())

    async def stop(self) -> None:
        self._stopped = True
        self._wake.set()
        if self._loop_task is not None:
            await self._loop_task
            self._loop_task = None

    async def submit(
        self, prompt_ids: np.ndarray, max_new_tokens: int
    ) -> list[int]:
        """Returns generated token ids (eos excluded)."""
        if not 0 < max_new_tokens <= self.cache_len - 2:
            raise ValueError(
                f"max_new_tokens must be in [1, {self.cache_len - 2}] "
                f"(cache_len={self.cache_len}), got {max_new_tokens}"
            )
        fut = asyncio.get_running_loop().create_future()
        await self._waiting.put(
            _Request(np.asarray(prompt_ids, np.int32), max_new_tokens, fut)
        )
        self._wake.set()
        return await fut

    @property
    def active_lanes(self) -> int:
        return sum(r is not None for r in self._lane_req)

    # -- engine loop -------------------------------------------------------
    async def _run(self) -> None:
        loop = asyncio.get_running_loop()
        pending = None  # (done_dev, [(lane, req)]) of the last segment
        while not self._stopped:
            try:
                self._admit_waiting()
                if self.active_lanes == 0:
                    if pending is not None:
                        await loop.run_in_executor(
                            None, self._process_done, *pending
                        )
                        pending = None
                        continue
                    if self._waiting.empty():
                        self._wake.clear()
                        try:
                            await asyncio.wait_for(self._wake.wait(), timeout=1.0)
                        except asyncio.TimeoutError:
                            pass
                        continue
                    continue
                nxt = self._dispatch_segment()
                if self.pipeline_segments:
                    # segment N+1 executes while N's done flags transfer
                    if pending is not None:
                        await loop.run_in_executor(
                            None, self._process_done, *pending
                        )
                    pending = nxt
                else:
                    await loop.run_in_executor(None, self._process_done, *nxt)
            except Exception as exc:  # noqa: BLE001 — a bad batch must not
                # take the loop (and every future submit) down with it
                logger.exception("decode engine iteration failed")
                for lane, r in enumerate(self._lane_req):
                    if r is not None and not r.future.done():
                        r.future.set_exception(exc)
                    self._lane_req[lane] = None
                self.done = jnp.ones((self.lanes,), bool)
                pending = None
        # drain on stop: resolve in-flight lanes with what they produced
        if pending is not None:
            self._process_done(*pending)
        if self.speculative and any(r is not None for r in self._lane_req):
            # device commit counts are authoritative; sync before collecting
            counts_np = np.asarray(self.counts)
            for lane, r in enumerate(self._lane_req):
                if r is not None:
                    r.written = int(counts_np[lane])
        for lane, r in enumerate(self._lane_req):
            if r is not None and not r.future.done():
                r.future.set_result(self._collect(lane, r))
        while not self._waiting.empty():
            r = self._waiting.get_nowait()
            if not r.future.done():
                r.future.set_exception(RuntimeError("decode engine stopped"))

    def _collect(self, lane: int, req: _Request) -> list[int]:
        """Fetch ONE lane's emissions as a fixed-shape [1, cap] row.

        dynamic_slice keeps the lane index a runtime operand, so every lane
        shares one cached executable and the transfer is ~4 KB — not the
        whole [lanes, cap] buffer (which would erode the device-resident
        emission optimization at scale), and not a per-(lane, n) recompile
        (a dynamic slice *length* would specialize per shape)."""
        n = min(req.written, req.max_new_tokens, self.cache_len)
        row = jax.lax.dynamic_slice_in_dim(self.emit_buf, lane, 1, axis=0)
        toks = [int(t) for t in np.asarray(row)[0, :n]]
        if self.eos in toks:
            toks = toks[: toks.index(self.eos)]
        return toks

    def _admit_waiting(self) -> int:
        free = [i for i, r in enumerate(self._lane_req) if r is None]
        batch: list[_Request] = []
        while free and not self._waiting.empty() and len(batch) < max(self.admit_buckets):
            req = self._waiting.get_nowait()
            req.lane = free.pop(0)
            batch.append(req)
        if not batch:
            return 0
        a = pick_bucket(len(batch), self.admit_buckets)
        longest = max(len(r.prompt_ids) for r in batch)
        cap = self.cache_len - max(r.max_new_tokens for r in batch) - 1
        p = min(pick_bucket(min(longest, cap), self.prefill_buckets + (cap,)), cap)
        ids = np.zeros((a, p), np.int32)
        mask = np.zeros((a, p), np.int32)
        # padding rows get lane id == lanes (out of range) -> dropped scatter
        lanes = np.full((a,), self.lanes, np.int32)
        for j, r in enumerate(batch):
            trunc = r.prompt_ids[:p]
            ids[j, : len(trunc)] = trunc
            mask[j, : len(trunc)] = 1
            lanes[j] = r.lane
        mask[len(batch):, 0] = 1  # keep position math valid on pad rows
        ids[len(batch):, 0] = 1
        if self.speculative:
            max_new = np.zeros((a,), np.int32)
            for j, r in enumerate(batch):
                max_new[j] = r.max_new_tokens
            (
                self.cache, self.tokens, self.done, self.emit_buf,
                self.counts, self.limits, self.prompts, self.prompt_len,
            ) = _admit_spec(
                self.params, self.cache, self.tokens, self.done,
                self.emit_buf, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(lanes), self.counts, self.limits, self.prompts,
                self.prompt_len, jnp.asarray(max_new),
                cfg=self.cfg, eos=self.eos, pcap=self._pcap,
            )
        else:
            self.cache, self.tokens, self.done, self.emit_buf = _admit(
                self.params, self.cache, self.tokens, self.done, self.emit_buf,
                jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(lanes),
                cfg=self.cfg, eos=self.eos,
            )
        for r in batch:
            r.written = 1  # the first (prefill-argmax) token is in the buffer
            self._lane_req[r.lane] = r
        return len(batch)

    def _dispatch_segment(self):
        """Dispatch one decode segment (no host sync) and start the async
        done-flag fetch. Returns (done_dev, counts_dev, snapshot) for
        _process_done (counts_dev is None outside speculative mode)."""
        counts_dev = None
        if self.speculative:
            it0 = self._spec_it
            self._spec_it += self.spec_rounds
            (
                self.cache, self.tokens, self.done, self.emit_buf, self.counts
            ) = _segment_spec(
                self.params, self.cache, self.tokens, self.done,
                self.emit_buf, self.counts, self.limits, self.prompts,
                self.prompt_len, jnp.int32(it0),
                cfg=self.cfg, rounds=self.spec_rounds, gamma=self.gamma,
                eos=self.eos, inject_accept_p=self.inject_accept_p,
            )
            counts_dev = self.counts
        else:
            offsets = np.zeros((self.lanes,), np.int32)
            for lane, req in enumerate(self._lane_req):
                if req is not None:
                    offsets[lane] = req.written
            self.cache, self.tokens, self.done, self.emit_buf = _segment(
                self.params, self.cache, self.tokens, self.done, self.emit_buf,
                jnp.asarray(offsets),
                cfg=self.cfg, steps=self.segment_steps, eos=self.eos,
            )
        self._m_segments.inc()
        snapshot = []
        for lane, req in enumerate(self._lane_req):
            if req is not None:
                if not self.speculative:
                    req.written += self.segment_steps
                snapshot.append((lane, req))
        done_dev = self.done
        try:
            done_dev.copy_to_host_async()
            if counts_dev is not None:
                counts_dev.copy_to_host_async()
        except Exception:  # noqa: BLE001 — hint only; asarray still works
            pass
        return done_dev, counts_dev, snapshot

    def _process_done(self, done_dev, counts_dev, snapshot) -> None:
        """Resolve completions for a previously dispatched segment. With
        pipeline_segments this runs one segment behind the device."""
        done_np = np.asarray(done_dev)  # the only per-segment host fetch
        counts_np = None if counts_dev is None else np.asarray(counts_dev)
        for lane, req in snapshot:
            if self._lane_req[lane] is not req:
                continue  # already resolved (error path / stop drain)
            if counts_np is not None:
                # speculative mode: commit counts are device-authoritative
                req.written = int(counts_np[lane])
            finished = done_np[lane] or req.written >= req.max_new_tokens
            if finished:
                toks = self._collect(lane, req)
                self._m_tokens.inc(len(toks))
                if not req.future.done():
                    req.future.get_loop().call_soon_threadsafe(
                        lambda f=req.future, t=toks: (
                            f.set_result(t) if not f.done() else None
                        )
                    )
                self._lane_req[lane] = None
        self._m_lanes.set(sum(r is not None for r in self._lane_req))
