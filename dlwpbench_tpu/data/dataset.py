"""Dataset layer: WeatherBench-style windowed sequences, TPU-native.

Reference: `data/datasets/datasets.py` (WeatherBenchDataset).  Capability
parity:

- per-variable z-score normalization with per-level stats, NaNs -> 0
  (`datasets.py:381-403`);
- variable roles: constants [1, Cc, (F), H, W], prescribed (forcing, e.g.
  tisr) [T, Cp, ...], prognostic (+1 step for the target) [T+1, Cq, ...]
  (`datasets.py:330-416`);
- non-overlapping windows of `sequence_length` starting at
  `item * sequence_length` (`datasets.py:323-336`), or explicit init dates;
- input noise injection on prognostic inputs (`datasets.py:414`);
- `target = prognostic[1:]`, returned from `context_size` on
  (`datasets.py:413-416`);
- `compute_statistics()` summary (`datasets.py:419-453`);
- biweekly Monday/Thursday 11:00 UTC init-date generator
  (`datasets.py:457-479`).

TPU-first design: instead of a torch DataLoader with worker processes feeding
per-item tensors, the whole split lives in host RAM as one numpy array per
role (the reference also loads the full split into RAM, `datasets.py:294-298`)
and batches are sliced + stacked on demand — the train step `device_put`s
them (or they are sharded over the mesh by the trainer).  Windowing is pure
index arithmetic; nothing is copied until a batch is materialized.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Mapping, Sequence

import numpy as np


@dataclasses.dataclass
class VariableStats:
    mean: float
    std: float

    def normalize(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / self.std

    def denormalize(self, x: np.ndarray) -> np.ndarray:
        return x * self.std + self.mean


def compute_stats(arr: np.ndarray) -> VariableStats:
    return VariableStats(float(np.nanmean(arr)), float(np.nanstd(arr)) or 1.0)


@dataclasses.dataclass
class WindowedWeatherDataset:
    """In-memory windowed dataset with the reference's item semantics.

    Args:
      constants: [Cc, (F), H, W] or None.
      prescribed: [T, Cp, (F), H, W] or None (already time-ordered).
      prognostic: [T, Cq, (F), H, W].
      sequence_length: steps per item (the model consumes seq+1 prognostic
        frames: seq inputs + 1 extra for targets).
      context_size: teacher-forcing context (targets returned from there on).
      noise: stddev of Gaussian noise added to prognostic inputs.
      init_indices: optional explicit window start indices (replaces the
        reference's init_dates; date -> index resolution happens in the
        data source, keeping this class pure array logic).
    """

    prognostic: np.ndarray
    constants: np.ndarray | None = None
    prescribed: np.ndarray | None = None
    sequence_length: int = 15
    context_size: int = 1
    noise: float = 0.0
    init_indices: Sequence[int] | None = None
    seed: int = 0
    # optional per-frame datetime64 timestamps (len == prognostic frames):
    # sources with a real calendar attach them so consumers (monthly
    # climatology, ACC, init-date reporting) can stratify by valid time;
    # not part of the batch tuple
    times: np.ndarray | None = None

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)
        assert self.prognostic.ndim >= 4
        if self.constants is not None and self.constants.ndim == self.prognostic.ndim - 1:
            self.constants = self.constants[None]  # [1, Cc, ...]

    def __len__(self) -> int:
        if self.init_indices is None:
            # max(0, .): a split shorter than one window has zero items
            # (a negative value makes len() itself raise)
            return max(
                0,
                (self.prognostic.shape[0] - self.sequence_length)
                // self.sequence_length,
            )
        return len(self.init_indices)

    def window_start(self, item: int) -> int:
        """Frame index where window `item` begins."""
        if self.init_indices is None:
            return item * self.sequence_length
        return int(self.init_indices[item])

    def target_frame_indices(self, item: int) -> np.ndarray:
        """Global frame indices of the target steps `item` yields (the
        frames metrics are computed against), clamped to the data end for
        zero-filled long rollouts — consumers index `times` with these."""
        start = self.window_start(item)
        idx = np.arange(
            start + 1 + self.context_size, start + self.sequence_length + 1
        )
        return np.minimum(idx, self.prognostic.shape[0] - 1)

    def __getitem__(self, item: int):
        start = self.window_start(item)
        seq = self.sequence_length

        pres = (
            None
            if self.prescribed is None
            else self.prescribed[start : start + seq]
        )
        if pres is not None and pres.shape[0] < seq:
            # long rollouts past the data end: continue the forcing by
            # repeating the last frame so every window in a batch has the
            # same length (the reference augments TISR from a fixed-year
            # file instead, `datasets.py:354-369` — a data-source-level
            # solution; sources can pass a longer prescribed series)
            if pres.shape[0] == 0:
                pres = np.zeros(
                    (seq, *self.prescribed.shape[1:]), np.float32
                )
            else:
                reps = np.repeat(pres[-1:], seq - pres.shape[0], axis=0)
                pres = np.concatenate([pres, reps], axis=0)
        prog_full = self.prognostic[start : start + seq + 1]
        if prog_full.shape[0] < seq + 1:  # long rollouts past data end
            fill = np.zeros(
                (seq + 1 - prog_full.shape[0], *prog_full.shape[1:]), np.float32
            )
            prog_full = np.concatenate([prog_full, fill], axis=0)

        target = prog_full[1:]
        prog = prog_full[:-1]
        if self.noise:
            prog = prog + np.float32(
                self._rng.standard_normal(prog.shape) * self.noise
            )
        return self.constants, pres, prog.astype(np.float32), target[
            self.context_size :
        ].astype(np.float32)

    def compute_statistics(self) -> dict:
        """Per-channel mean/std/min/max over the split (reference
        `datasets.py:419-453` compute_statistics)."""
        out = {}
        for role, arr in (
            ("prognostic", self.prognostic),
            ("prescribed", self.prescribed),
            ("constants", self.constants),
        ):
            if arr is None:
                continue
            c_axis = 1 if arr.ndim >= 4 else 0
            axes = tuple(i for i in range(arr.ndim) if i != c_axis)
            out[role] = {
                "mean": np.nanmean(arr, axis=axes).tolist(),
                "std": np.nanstd(arr, axis=axes).tolist(),
                "min": np.nanmin(arr, axis=axes).tolist(),
                "max": np.nanmax(arr, axis=axes).tolist(),
            }
        return out

    def batches(
        self, batch_size: int, shuffle: bool = False, drop_last: bool = False,
        host_id: int = 0, n_hosts: int = 1, epoch: int | None = None,
    ) -> Iterator[tuple]:
        """Yield batched (constants, prescribed, prognostic, target) arrays
        with a leading batch dim.

        Multi-host sharding (SURVEY hard part #6: per-host shards must be
        deterministic so distributed metrics equal single-host metrics):
        with `n_hosts > 1`, every host builds the SAME epoch permutation —
        seeded purely by (dataset seed, epoch), so pass `epoch` whenever
        shuffling across hosts — and host h takes the strided slice
        order[h::n_hosts] (truncated so all hosts yield equally many
        batches).  The union of all hosts' windows is exactly the
        single-host epoch; shards are disjoint.

        Fast path: the native C++ window batcher (`data/native.py`) gathers
        all windows of a batch with multithreaded memcpy + fused noise; falls
        back to per-item numpy stacking when unavailable or when windows
        extend past the data end (zero-fill case).
        """
        order = np.arange(len(self))
        if shuffle:
            if n_hosts > 1:
                if epoch is None:
                    raise ValueError(
                        "multi-host shuffling needs `epoch` so every host "
                        "derives the same permutation"
                    )
                np.random.default_rng((self.seed, int(epoch))).shuffle(order)
            else:
                self._rng.shuffle(order)
        if n_hosts > 1:
            if not 0 <= host_id < n_hosts:
                raise ValueError(f"host_id {host_id} not in [0, {n_hosts})")
            usable = len(order) - len(order) % n_hosts  # hosts in lockstep
            order = order[host_id:usable:n_hosts]
        n = len(order)
        step = batch_size
        stop = n - (n % step) if drop_last else n
        for i in range(0, stop, step):
            idxs = order[i : i + step]
            fast = self._batch_native(idxs)
            if fast is not None:
                yield fast
                continue
            items = [self[j] for j in idxs]
            const = None if items[0][0] is None else np.stack([it[0] for it in items])
            pres = None if items[0][1] is None else np.stack([it[1] for it in items])
            prog = np.stack([it[2] for it in items])
            tar = np.stack([it[3] for it in items])
            yield const, pres, prog, tar

    def _batch_native(self, idxs: np.ndarray):
        from dlwpbench_tpu.data import native

        if not native.available():
            return None
        seq = self.sequence_length
        if self.init_indices is None:
            starts = idxs.astype(np.int64) * seq
        else:
            starts = np.asarray(
                [int(self.init_indices[j]) for j in idxs], np.int64
            )
        if (starts + seq + 1 > self.prognostic.shape[0]).any():
            return None  # zero-fill path -> slow fallback
        B = len(starts)
        prog_full = native.assemble_windows(self.prognostic, starts, seq + 1)
        target = prog_full[:, 1:]
        prog = np.ascontiguousarray(prog_full[:, :-1])
        if self.noise:
            native.add_gaussian_noise(
                prog, float(self.noise), int(self._rng.integers(2**62))
            )
        pres = (
            native.assemble_windows(self.prescribed, starts, seq)
            if self.prescribed is not None
            else None
        )
        const = (
            None
            if self.constants is None
            else np.broadcast_to(
                self.constants[None], (B, *self.constants.shape)
            ).copy()
        )
        return const, pres, prog, np.ascontiguousarray(
            target[:, self.context_size :]
        )


def normalize_variables(
    raw: Mapping[str, np.ndarray], stats: Mapping[str, VariableStats] | None = None
) -> tuple[dict[str, np.ndarray], dict[str, VariableStats]]:
    """Z-score each variable (NaN -> 0 after normalization, `datasets.py:397`)."""
    stats = dict(stats) if stats else {}
    out = {}
    for name, arr in raw.items():
        st = stats.get(name) or compute_stats(arr)
        stats[name] = st
        out[name] = np.nan_to_num(st.normalize(arr)).astype(np.float32)
    return out, stats


def biweekly_init_indices(
    times: np.ndarray, start: np.datetime64, stop: np.datetime64
) -> np.ndarray:
    """Indices of biweekly Monday/Thursday 11:00 UTC inits in `times`.

    Reference `datasets.py:457-479` / `evaluate.py:56-77`: forecasts start
    Mondays and Thursdays at 11:00 UTC within the test period.
    """
    import pandas as pd

    t = pd.DatetimeIndex(times)
    sel = (
        (t >= pd.Timestamp(start))
        & (t <= pd.Timestamp(stop))
        & (t.dayofweek.isin([0, 3]))
        & (t.hour == 11)
    )
    return np.nonzero(np.asarray(sel))[0]


def synthetic_weatherbench(
    n_time: int = 64,
    nlat: int = 32,
    nlon: int = 64,
    n_prognostic: int = 8,
    n_prescribed: int = 1,
    n_constants: int = 4,
    healpix_nside: int | None = None,
    seed: int = 0,
):
    """Deterministic synthetic ERA5-like arrays for tests and benchmarks.

    Smooth space-time random fields (bandlimited noise advected in
    longitude), shaped like the WeatherBench 5.625-degree data:
    returns (constants [Cc,(F),H,W] | None, prescribed [T,Cp,...] | None,
    prognostic [T,Cq,...]).
    """
    rng = np.random.default_rng(seed)
    if healpix_nside:
        spatial = (12, healpix_nside, healpix_nside)
    else:
        spatial = (nlat, nlon)

    def smooth_field(shape):
        x = rng.standard_normal(shape).astype(np.float32)
        # cheap spatial smoothing for realism (separable box filter)
        for ax in range(len(shape) - len(spatial), len(shape)):
            x = (x + np.roll(x, 1, ax) + np.roll(x, -1, ax)) / 3.0
        return x

    prog = np.cumsum(
        0.1 * smooth_field((n_time + 1, n_prognostic, *spatial)), axis=0
    ).astype(np.float32)
    pres = (
        smooth_field((n_time + 1, n_prescribed, *spatial)) if n_prescribed else None
    )
    const = smooth_field((n_constants, *spatial)) if n_constants else None
    return const, pres, prog
