"""Incremental convex hull + MABR line fitting — semantic mirror of the
reference's geometry utility (/root/reference/src/utilities/convex_hull.zig).

Points are ``(time: int, value: float)`` tuples. The hull keeps an upper chain
(right turns only, zig :69-72) and a lower chain (left turns only); the first
and last input points appear in both chains. ``at``/``__len__`` reproduce the
reference's combined indexing (zig :283-315): lower chain left-to-right, then
the upper chain's interior points left-to-right.

``compute_mabr_linear_function`` is the rotating-calipers minimum-area
bounding rectangle fit (Shamos 1978; zig :107-192): for each hull edge,
rotate all hull points so the edge is horizontal, take the bounding box, and
keep the smallest-area box; the returned line is the box's horizontal
bisector (slope = tan(edge angle), through the rotated-back box center).

``compute_max_error`` accumulates in 80-bit extended precision
(``np.longdouble`` == x87 f80 on x86-64 Linux) exactly like the reference's
f80 loop (zig :254-280).

``merge`` is the O(n) tangent-based hull union (zig :197-250, :451-523).
Like the reference, ``_find_tangent`` MUTATES the first hull by popping
convexity-violating points (zig :512) — this in-place behavior is observable
through later queries and is preserved.
"""

from __future__ import annotations

import math

import numpy as np

from ..errors import EmptyConvexHullError

RIGHT, LEFT, COLLINEAR = 0, 1, 2

_F64_MAX = float(np.finfo(np.float64).max)
_F64_MIN = float(np.finfo(np.float64).tiny)  # std.math.floatMin(f64) (zig :147,149)


def compute_turn(first, middle, last) -> int:
    """Turn of the path first->middle->last (zig :406-423)."""
    cross = (middle[1] - first[1]) * float(last[0] - middle[0]) - (
        last[1] - middle[1]
    ) * float(middle[0] - first[0])
    if cross == 0:
        return COLLINEAR
    return RIGHT if cross > 0 else LEFT


def _add_to_hull(hull: list, turn: int, point) -> None:
    """Graham-scan append keeping only the given turn direction (zig :384-400)."""
    if len(hull) < 2:
        hull.append(point)
        return
    top = len(hull) - 1
    while top > 0 and compute_turn(hull[top - 1], hull[top], point) != turn:
        hull.pop()
        top -= 1
    hull.append(point)


class ConvexHull:
    __slots__ = ("lower", "upper")

    def __init__(self):
        self.lower: list = []
        self.upper: list = []

    def add(self, point) -> None:
        _add_to_hull(self.upper, RIGHT, point)
        _add_to_hull(self.lower, LEFT, point)

    def clean(self) -> None:
        self.upper.clear()
        self.lower.clear()

    def upper_except_last(self) -> list:
        return self.upper[:-1] if len(self.upper) > 1 else []

    def lower_except_last(self) -> list:
        return self.lower[:-1] if len(self.lower) > 1 else []

    def __len__(self) -> int:
        total = len(self.lower) + len(self.upper)
        if total == 0:
            return 0
        if total == 2:  # single point, repeated in both chains
            return 1
        return total - 2

    def at(self, index: int):
        """Combined indexing with wraparound (zig :283-315)."""
        n = len(self)
        index = index % n
        if index < len(self.lower):
            return self.lower[index]
        return self.upper[index - len(self.lower) + 1]

    def combined_points(self) -> list:
        """``[at(0), ..., at(n-1)]`` in one pass (lower chain, then the
        upper chain's interior) — avoids the per-index arithmetic when a
        whole-hull scan is needed."""
        if len(self.lower) + len(self.upper) <= 2:
            return list(self.lower[:1])
        return self.lower + self.upper[1:-1]

    def all_points_sorted(self) -> list:
        """Time-ordered merge of the two chains, endpoints once (zig :339-380)."""
        out = []
        lower, upper = self.lower, self.upper
        li, ui = 0, 1
        while li < len(lower) and ui < len(upper) - 1:
            if lower[li][0] <= upper[ui][0]:
                out.append(lower[li])
                li += 1
            else:
                out.append(upper[ui])
                ui += 1
        out.extend(lower[li:])
        out.extend(upper[ui : len(upper) - 1])
        return out

    def _arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(t, v) float64 arrays of the combined hull points."""
        points = self.combined_points()
        n = len(points)
        t_arr = np.fromiter((float(p[0]) for p in points), np.float64, n)
        v_arr = np.fromiter((p[1] for p in points), np.float64, n)
        return t_arr, v_arr

    @staticmethod
    def _mabr(t_arr: np.ndarray, v_arr: np.ndarray):
        """MABR line over the hull arrays (n >= 3 branch).

        Vectorized edges x points rotation. ``atan2``/``tan`` stay SCALAR
        (numpy's differ from libm bit-wise — measured), while cos/sin ARE
        numpy (measured bit-identical to math.cos/math.sin, including the
        cos(-x)=cos(x) / sin(-x)=-sin(x) sign symmetry the scalar code
        relied on). The rotate + min/max fold is the same IEEE op per
        element and min/max are order-insensitive, so the result is
        bit-identical to the reference's scalar loop. The reference's
        floatMin(f64) max-init quirk (zig :147,149) is preserved by folding
        the reductions against the same initial values.
        """
        n = t_arr.shape[0]
        dy = np.empty(n, np.float64)
        dx = np.empty(n, np.float64)
        dy[:-1] = v_arr[1:] - v_arr[:-1]
        dy[-1] = v_arr[0] - v_arr[-1]
        dx[:-1] = t_arr[1:] - t_arr[:-1]
        dx[-1] = t_arr[0] - t_arr[-1]
        angles = np.fromiter(
            (math.atan2(dy[i], dx[i]) for i in range(n)), np.float64, n
        )
        cos_a = np.cos(angles)  # == cos(-angle) bit-wise
        sin_a = np.sin(-angles)
        rx = t_arr[None, :] * cos_a[:, None] - v_arr[None, :] * sin_a[:, None]
        ry = t_arr[None, :] * sin_a[:, None] + v_arr[None, :] * cos_a[:, None]
        min_x = np.minimum(rx.min(axis=1), _F64_MAX)
        max_x = np.maximum(rx.max(axis=1), _F64_MIN)
        min_y = np.minimum(ry.min(axis=1), _F64_MAX)
        max_y = np.maximum(ry.max(axis=1), _F64_MIN)
        areas = (max_x - min_x) * (max_y - min_y)
        # first-occurrence argmin == the scalar loop's strict `<` update
        i = int(np.argmin(areas))
        angle = float(angles[i])
        min_slope = math.tan(angle)
        center_x = (float(min_x[i]) + float(max_x[i])) / 2.0
        center_y = (float(min_y[i]) + float(max_y[i])) / 2.0
        cos_b = float(cos_a[i])  # cos(angle) == cos(-angle)
        sin_b = -float(sin_a[i])  # sin(angle) == -sin(-angle), exact
        back_x = center_x * cos_b - center_y * sin_b
        back_y = center_x * sin_b + center_y * cos_b
        return min_slope, back_y - min_slope * back_x

    def compute_mabr_linear_function(self):
        """Minimum-area bounding rectangle bisector line (zig :107-192)."""
        n = len(self)
        if n == 1:
            return 0.0, self.at(0)[1]
        if n == 2:
            p0, p1 = self.at(0), self.at(1)
            delta_time = float(p1[0] - p0[0])
            slope = (p1[1] - p0[1]) / delta_time
            return slope, p0[1] - slope * float(p0[0])
        return self._mabr(*self._arrays())

    @staticmethod
    def _max_error_from_arrays(
        t_arr: np.ndarray, v_arr: np.ndarray, slope: float, intercept: float
    ) -> float:
        # float64 -> f80 conversion is exact, so these are the same f80 ops
        # per point as the reference's scalar loop; max is order-insensitive
        # and the scalar loop's 0.0 start is preserved by the final fold
        errors = np.abs(
            np.longdouble(slope) * t_arr.astype(np.longdouble)
            + np.longdouble(intercept)
            - v_arr.astype(np.longdouble)
        )
        return float(np.float64(np.maximum(errors.max(), np.longdouble(0.0))))

    def compute_max_error(self, slope: float, intercept: float) -> float:
        """L-inf error of the line over the hull, f80 accumulation (zig :254-280)."""
        if len(self) == 0:
            raise EmptyConvexHullError("empty convex hull")
        t_arr, v_arr = self._arrays()
        return self._max_error_from_arrays(t_arr, v_arr, slope, intercept)

    def mabr_max_error(self) -> float:
        """Fused MABR fit + f80 max-error in ONE hull scan — the PWLH
        per-insert merge-error evaluation (histogram_compression.zig
        :403-420 computes exactly this pair back to back)."""
        n = len(self)
        if n == 0:
            raise EmptyConvexHullError("empty convex hull")
        if n == 1:
            slope, intercept = 0.0, self.at(0)[1]
            t_arr, v_arr = self._arrays()
        elif n == 2:
            slope, intercept = self.compute_mabr_linear_function()
            t_arr, v_arr = self._arrays()
        else:
            t_arr, v_arr = self._arrays()
            slope, intercept = self._mabr(t_arr, v_arr)
        return self._max_error_from_arrays(t_arr, v_arr, slope, intercept)

    def merge(self, other: "ConvexHull", merged: "ConvexHull | None" = None) -> None:
        """Union with another hull, in-place or into ``merged`` (zig :197-250)."""
        if merged is not None:
            # Direct chain copy — equivalent to re-adding all_points_sorted()
            # through the Graham scan (the points are already the hull's
            # vertices in strictly-increasing time order, so the scan keeps
            # every one and rebuilds identical chains), but O(n) C-level.
            merged.lower = list(self.lower)
            merged.upper = list(self.upper)
        target = merged if merged is not None else self

        if len(other) == 1:
            target.add(other.at(0))
            return
        if len(target) == 1:
            for point in other.all_points_sorted():
                target.add(point)
            return

        _, upper_two_idx = _find_tangent(target.upper, other.upper, upper=True)
        _, lower_two_idx = _find_tangent(target.lower, other.lower, upper=False)
        target.upper.extend(other.upper[upper_two_idx:])
        target.lower.extend(other.lower[lower_two_idx:])


def _find_tangent(hull_one: list, hull_two: list, *, upper: bool):
    """Outer tangent between two chains; pops violators from hull_one (zig :451-523)."""
    if not hull_one or not hull_two:
        raise EmptyConvexHullError("empty convex hull")
    violation = LEFT if upper else RIGHT
    one_idx = len(hull_one) - 1
    two_idx = 0
    while True:
        if two_idx != len(hull_two) - 1:
            turn = compute_turn(hull_one[one_idx], hull_two[two_idx], hull_two[two_idx + 1])
            if turn == violation:
                two_idx += 1
                continue
        if one_idx != 0:
            turn = compute_turn(hull_one[one_idx - 1], hull_one[one_idx], hull_two[two_idx])
            if turn == violation:
                one_idx -= 1
                hull_one.pop()
                continue
        break
    return one_idx, two_idx
