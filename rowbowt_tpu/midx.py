"""Positional marker index — the rle_window_arr / `.midx` equivalent.

The reference's rb_locs pipeline (src/rb_markers_tsa.cpp:76-88) locates a read
at text position l, then asks a separate structure for the markers overlapping
text span [l, l+readlen-1] (pfbwt-f's rle_window_arr, built by build_midx from
a text marker-position file).  TPU-native replacement: sorted marker text
positions + packed values, queried with searchsorted — dense tables instead of
run-length-encoded window lists.

Text input format for rbt_midx (one marker site occurrence per line):
    <text_pos> <seq> <pos> <allele>
"""

from __future__ import annotations

import dataclasses

import numpy as np

from rowbowt_tpu.index import pack_marker


@dataclasses.dataclass
class PosMarkers:
    pos: np.ndarray  # int64[M] sorted text positions
    val: np.ndarray  # int64[M] packed markers (ties sorted by value)

    @staticmethod
    def from_pairs(positions, values) -> "PosMarkers":
        pos = np.asarray(positions, dtype=np.int64)
        val = np.asarray(values, dtype=np.int64)
        srt = np.lexsort((val, pos))
        return PosMarkers(pos[srt], val[srt])

    @staticmethod
    def from_panel(panel) -> "PosMarkers":
        return PosMarkers.from_pairs(
            [m.text_pos for m in panel.markers],
            [pack_marker(m.seq, m.pos, m.allele) for m in panel.markers],
        )

    @staticmethod
    def from_text_file(path: str) -> "PosMarkers":
        ps, vs = [], []
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                tpos, seq, pos, allele = (int(x) for x in parts[:4])
                ps.append(tpos)
                vs.append(pack_marker(seq, pos, allele))
        return PosMarkers.from_pairs(ps, vs)

    def at_range(self, l: int, r: int) -> np.ndarray:
        """Markers at text positions in [l, r] (rle_window_arr::at_range)."""
        s = int(np.searchsorted(self.pos, l, side="left"))
        e = int(np.searchsorted(self.pos, r + 1, side="left"))
        return self.val[s:e]

    def save(self, path: str) -> None:
        np.savez(path, pos=self.pos, val=self.val)

    @staticmethod
    def load(path: str) -> "PosMarkers":
        z = np.load(path)
        return PosMarkers(z["pos"], z["val"])
