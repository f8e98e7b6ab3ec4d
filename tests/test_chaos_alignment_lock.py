"""Lock the per-volume CHAOS aligned pair counts against the reference.

The reference encodes the hand-curated T1<->T2 alignment as inline numpy
slicing per volume (loaders/chaos.py:110-240). The expected counts below
were derived BY HAND from that inline slicing (each value is the length of
the final t1/t2 index lists after applying the reference's ops in order),
so this test locks data/chaos_alignment.py::aligned_indices against an
independent reading of the reference — not against itself.

16 of the 20 volumes use only non-negative closed slice bounds, so their
pair count is a constant whenever the raw slice counts reach the largest
stop index used. Volumes 8 and 22 carry one open/negative t1 bound but
saturate to a constant above a raw-count threshold. Volumes 33 and 37 are
genuinely open-ended (counts grow with the raw volume length); their
closed forms are locked instead.
"""

import numpy as np
import pytest

from multimodal_segmentation_tpu.data.chaos_alignment import (
    ALIGNMENT_OPS,
    aligned_indices,
)

ALL_VOLUMES = [1, 2, 3, 5, 8, 10, 13, 15, 19, 20, 21, 22, 31, 32, 33, 34, 36, 37, 38, 39]

# Derived by hand from /root/reference/loaders/chaos.py:110-240.
# volume: (pairs, min_n_t1, min_n_t2) -- count is exact for any raw counts
# >= the minima (python-slice clipping below them shrinks the count, which
# the reference would hit identically).
FIXED_COUNTS = {
    # t1: [0:26] then [0:5]+[7:10]+[13:17]+[18:26] = 5+3+4+8 = 20
    # t2: [1:] then [4:24] = 20
    1: (20, 26, 25),
    # t1: [4:7]+[8:23] = 18 then [0:11]+[12:18] = 17; t2: [3:22] then same = 17
    2: (17, 23, 22),
    # t1: [11:14]+[15:26] = 14; t2: [9:23] = 14
    3: (14, 26, 23),
    # t1: [4:5]+[8:24] = 17 then [0:8]+[9:17] = 16
    # t2: [2:22] = 20 then [0:6]+[9:20] = 17 then [0:8]+[9:17] = 16
    5: (16, 24, 22),
    # t1: [2:n-2] then [5:11]+[12:27] = 6+15 = 21 (needs n-4 >= 27)
    # t2: [6:27] = 21
    8: (21, 31, 27),
    # t1: [14:38] = 24 then [0:8]+[12:18]+[19:24] = 8+6+5 = 19; t2: [5:24] = 19
    10: (19, 38, 24),
    13: (25, 29, 28),  # t1 [4:29], t2 [3:28]
    15: (22, 22, 22),  # t1 [:22], t2 [:22]
    19: (19, 27, 24),  # t1 [8:27], t2 [5:24]
    20: (19, 21, 21),  # t1 [2:21], t2 [2:21]
    21: (16, 19, 21),  # t1 [3:19], t2 [5:21]
    # t1: [:n-2] then [8:17]+[18:26] = 9+8 = 17 (needs n-2 >= 26)
    # t2: [3:12]+[15:23] = 9+8 = 17
    22: (17, 28, 23),
    31: (16, 23, 22),  # t1 [7:23]; t2 [5:12]+[13:22] = 7+9 = 16
    32: (27, 32, 30),  # t1 [5:32], t2 [3:30]
    # t1: [1:2]+[3:4]+[5:6]+[7:27] = 23 then [0:14]+[15:16]+[17:18]+[19:22]+[23:24] = 19
    # t2: [2:21] = 19
    34: (19, 27, 21),
    36: (17, 25, 22),  # t1 [8:25]; t2 [4:6]+[7:22] = 2+15 = 17
    38: (15, 24, 24),  # t1 [9:24], t2 [9:24]
    39: (19, 22, 22),  # t1 [3:22], t2 [3:22]
}

# Open-ended volumes: closed-form counts as functions of raw slice counts,
# again derived from the reference's slicing.
#   33: t1 [7:n1-5] -> n1-12; t2 [3:12]+[15:n2-2] -> 9+(n2-17) = n2-8
#   37: t1 [9:23]+[24:n1-1] -> 14+max(0, n1-25)
#       t2 [4:6]+[7:21]+[22:n2-7] -> 16+max(0, n2-29)   (3rd slice empty for n2<30)
OPEN_FORMS = {
    33: lambda n1, n2: min(n1 - 12, n2 - 8),
    37: lambda n1, n2: min(14 + max(0, n1 - 25), 16 + max(0, n2 - 29)),
}

SPLITS = [
    {"validation": [31, 36, 13], "test": [10, 22, 34],
     "training": [5, 3, 1, 15, 19, 2, 20, 37, 32, 38, 8, 39, 21, 33]},
    {"validation": [13, 3, 20], "test": [5, 15, 39],
     "training": [33, 8, 38, 34, 36, 31, 32, 37, 22, 2, 1, 10, 19, 21]},
    {"validation": [37, 13, 33], "test": [1, 19, 32],
     "training": [5, 20, 31, 2, 38, 3, 8, 15, 22, 10, 34, 39, 36, 21]},
]

# A plausible real-archive raw-count profile (CHAOS MR volumes have ~26-50
# slices) satisfying every threshold above; used for the split totals.
RAW = {v: (max(FIXED_COUNTS.get(v, (0, 30, 30))[1], 32) + 4,
           max(FIXED_COUNTS.get(v, (0, 30, 30))[2], 32) + 4)
       for v in ALL_VOLUMES}


class TestAlignmentLock:
    @pytest.mark.parametrize("volume", sorted(FIXED_COUNTS))
    def test_fixed_volume_counts(self, volume):
        pairs, n1_min, n2_min = FIXED_COUNTS[volume]
        # exact at the threshold and invariant for anything larger
        for extra in (0, 1, 5, 20):
            i1, i2 = aligned_indices(volume, n1_min + extra, n2_min + extra)
            assert len(i1) == len(i2) == pairs, (
                f"vol {volume}: {len(i1)}/{len(i2)} pairs at raw "
                f"({n1_min + extra},{n2_min + extra}), reference slicing gives {pairs}"
            )

    @pytest.mark.parametrize("volume", sorted(OPEN_FORMS))
    def test_open_volume_closed_form(self, volume):
        form = OPEN_FORMS[volume]
        for n1 in range(28, 45, 3):
            for n2 in range(28, 45, 3):
                i1, i2 = aligned_indices(volume, n1, n2)
                assert len(i1) == len(i2) == form(n1, n2)

    @pytest.mark.parametrize("volume", ALL_VOLUMES)
    def test_indices_valid(self, volume):
        n1, n2 = RAW[volume]
        i1, i2 = aligned_indices(volume, n1, n2)
        for idx, n in ((i1, n1), (i2, n2)):
            assert len(idx) > 0
            assert (np.diff(idx) > 0).all(), "indices must be strictly increasing"
            assert idx[0] >= 0 and idx[-1] < n

    def test_equal_length_before_truncation(self):
        """The reference never truncates to a common length — its curation
        makes both modality lists come out equal. At the locked raw-count
        profile, our op table reproduces that equality for every fixed
        volume (i.e. the pairing-up-to-common-length in aligned_indices is
        a no-op there, not load-bearing)."""
        for v, (pairs, n1_min, n2_min) in FIXED_COUNTS.items():
            idx = {"t1": np.arange(n1_min + 6), "t2": np.arange(n2_min + 6)}
            for mod, slices in ALIGNMENT_OPS[v]:
                cur = idx[mod]
                idx[mod] = np.concatenate([cur[slice(a, b)] for a, b in slices])
            assert len(idx["t1"]) == len(idx["t2"]) == pairs, f"vol {v}"

    @pytest.mark.parametrize("split", [0, 1, 2])
    def test_split_totals(self, split):
        """Aggregate pair counts per split at the locked raw-count profile —
        the dataset sizes a real-CHAOS run will report in its logs."""
        def count(v):
            i1, _ = aligned_indices(v, *RAW[v])
            return len(i1)

        totals = {k: sum(count(v) for v in vs) for k, vs in SPLITS[split].items()}
        all_counts = {v: count(v) for v in ALL_VOLUMES}
        # fixed volumes contribute their locked constants
        for v, (pairs, _, _) in FIXED_COUNTS.items():
            assert all_counts[v] == pairs
        # every volume appears exactly once across the split
        seen = sorted(sum(SPLITS[split].values(), []))
        assert seen == sorted(ALL_VOLUMES)
        assert totals["training"] + totals["validation"] + totals["test"] == sum(
            all_counts.values()
        )
        # grand total is raw-count-dependent only through vols 33/37
        fixed_total = sum(p for p, _, _ in FIXED_COUNTS.values())
        open_total = sum(OPEN_FORMS[v](*RAW[v]) for v in OPEN_FORMS)
        assert sum(all_counts.values()) == fixed_total + open_total
