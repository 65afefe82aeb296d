"""Brute-force diagram enumeration: an oracle independent of BOTH the
parquet recursion and the GV tables.

No reference counterpart (the reference's strongest oracles are the closed
-form count formulas of arXiv:cond-mat/0512342, capped at the orders the
paper tabulates, and the legacy parquet evaluator — itself a parquet
recursion).  This module enumerates polarization / self-energy diagram
topologies directly as permutations, the same representation the offline
generator uses (/root/reference/src/frontend/GV_diagrams/diagram.py:9-73):

- slots 0, 1 are the two external density vertices (polarization) or the
  external in/out attach points (sigma); slots 2i, 2i+1 are the two ends of
  interaction line i;
- a diagram is a permutation pi (fermion line from slot v to pi[v]);
- validity: connected; no tadpole (pi[v] == v, Hartree); no Fock
  (single G across one interaction; polarization only); every interaction
  edge non-bridge (a bridge separating the externals = improper, a bridge
  isolating a neutral component = Hartree dangling); sigma additionally
  requires 1PI and G-irreducibility (no 1- or 2-G cut disconnects);
- topologies = orbits under interaction-line relabeling x end swaps;
- counts: each topology contributes spin^(free fermion cycles), where
  cycles through external slots are spin-pinned; signs are +1 in the
  bosonic convention (isFermi=False — how the reference count tests run,
  front_end.jl:758-824) and (-1)^(#cycles) in the fermionic convention.

Validated facts this oracle established (round 3):
- polarization NoHartree+NoFock counts, bosonic: orders 2-5 =
  (2,0), (28,4), (274,52), (3586,844) for (UpUp, UpDown) — reproducing
  diagram_count.jl's table including the order-5 entries no live test had
  ever checked;
- sigma G2v (Girreducible) spin-2 counts: orders 2-4 = 3, 18, 171;
- the LIVE parquet polarization at order 5 matches this oracle EXACTLY in
  the physical fermionic convention ((39, 22) at leaf==1), including the
  64 topologies whose 4-point core is fully irreducible (2PI), delivered
  by the Alli table insertion;
- CAVEAT: under isFermi=False the leaf==1 "count identity" breaks at
  order >= 5, because the GV Vertex4I tables bake fermionic loop signs and
  spin factors into the inserted subgraphs (they do not switch to the
  bosonic convention).  Parquet-with-Alli then evaluates to (3418, 764),
  not (3586, 844).  The reference behaves identically by construction;
  its tests stop at order 4, where Alli content contributes nothing.
"""
from __future__ import annotations

import itertools
from typing import Dict, Iterator, List, Sequence, Tuple

Perm = Tuple[int, ...]


def _components(n: int, edges) -> List[List[int]]:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: Dict[int, List[int]] = {}
    for v in range(n):
        groups.setdefault(find(v), []).append(v)
    return list(groups.values())


def _cycles(perm: Sequence[int]) -> List[List[int]]:
    n = len(perm)
    seen = [False] * n
    out = []
    for v in range(n):
        if seen[v]:
            continue
        c = []
        x = v
        while not seen[x]:
            seen[x] = True
            c.append(x)
            x = perm[x]
        out.append(c)
    return out


# ---------------------------------------------------------------------------
# polarization
# ---------------------------------------------------------------------------

def _polar_valid(perm: Perm, nw: int, *, fock_ok: bool = False,
                 improper_ok: bool = False) -> bool:
    n = 2 + 2 * nw
    for v in range(n):
        if perm[v] == v:
            return False
    if not fock_ok:
        for w in range(nw):
            a, b = 2 * w + 2, 2 * w + 3
            if perm[a] == b or perm[b] == a:
                return False
    g_edges = [(v, perm[v]) for v in range(n)]
    w_edges = [(2 * w + 2, 2 * w + 3) for w in range(nw)]
    if len(_components(n, g_edges + w_edges)) != 1:
        return False
    for w in range(nw):
        other = [e for i, e in enumerate(w_edges) if i != w]
        comps = _components(n, g_edges + other)
        if len(comps) == 1:
            continue
        zero_in = next(c for c in comps if 0 in c)
        if 1 in zero_in:
            return False          # Hartree dangling
        if not improper_ok:
            return False          # improper (external momentum on line w)
    return True


def _polar_orbit(perm: Perm, nw: int) -> set:
    n = 2 + 2 * nw
    orbit = set()
    for lp in itertools.permutations(range(nw)):
        for fl in itertools.product((0, 1), repeat=nw):
            m = list(range(n))
            for w in range(nw):
                na, nb = 2 * lp[w] + 2, 2 * lp[w] + 3
                if fl[w]:
                    na, nb = nb, na
                m[2 * w + 2], m[2 * w + 3] = na, nb
            new = [0] * n
            for v in range(n):
                new[m[v]] = m[perm[v]]
            orbit.add(tuple(new))
    return orbit


def polar_topologies(order: int, *, fock_ok: bool = False,
                     improper_ok: bool = False) -> Iterator[Perm]:
    """Yield one representative per valid polarization topology."""
    nw = order - 1
    n = 2 + 2 * nw
    seen = set()
    for perm in itertools.permutations(range(n)):
        if perm in seen:
            continue
        if not _polar_valid(perm, nw, fock_ok=fock_ok, improper_ok=improper_ok):
            continue
        seen |= _polar_orbit(perm, nw)
        yield perm


def count_polar_brute_force(order: int, spin: int = 2, *,
                            fermionic: bool = False,
                            fock_ok: bool = False) -> Tuple[int, int]:
    """(UpUp, UpDown) diagram sums at leaf==1.

    Bosonic (default): unsigned counts; x``spin`` recovers the published
    convention of diagram_count.count_polar_g2v_noFock_upup/updown.
    Fermionic: each topology signed by (-1)^(#fermion cycles) — matches the
    live parquet builder with ``isFermi=True`` up to the per-order global
    sign.
    """
    s_upup = 0
    s_updown = 0
    for perm in polar_topologies(order, fock_ok=fock_ok):
        cyc = _cycles(perm)
        c0 = next(i for i, c in enumerate(cyc) if 0 in c)
        c1 = next(i for i, c in enumerate(cyc) if 1 in c)
        free = len(cyc) - (1 if c0 == c1 else 2)
        w = spin ** free
        if fermionic:
            w *= (-1) ** len(cyc)
        s_upup += w
        if c0 != c1:
            s_updown += w
    return s_upup, s_updown


# ---------------------------------------------------------------------------
# self-energy (G2v / Girreducible family)
# ---------------------------------------------------------------------------

def sigma_topologies(order: int) -> Iterator[Tuple[int, int, Dict[int, int]]]:
    """Yield (a, b, tau) per G2v sigma topology: external line enters at
    slot ``a``, exits at ``b``; ``tau`` maps each other slot to the slot its
    internal G feeds.  Girreducible: no 1- or 2-G cut disconnects."""
    nw = order
    n = 2 * nw
    w_edges = [(2 * i, 2 * i + 1) for i in range(nw)]
    seen = set()
    for a in range(n):
        for b in range(n):
            dom = [v for v in range(n) if v != b]
            img = [v for v in range(n) if v != a]
            for pperm in itertools.permutations(img):
                tau = dict(zip(dom, pperm))
                if any(v == w for v, w in tau.items()):
                    continue
                g_edges = list(tau.items())
                if len(_components(n, g_edges + w_edges)) != 1:
                    continue
                ok = True
                for k in (1, 2):
                    for cut in itertools.combinations(g_edges, k):
                        rem = [e for e in g_edges if e not in cut]
                        if len(_components(n, rem + w_edges)) > 1:
                            ok = False
                            break
                    if not ok:
                        break
                if not ok:
                    continue
                canon = _sigma_canon(a, b, tau, nw)
                if canon in seen:
                    continue
                seen.add(canon)
                yield a, b, tau


def _sigma_canon(a: int, b: int, tau: Dict[int, int], nw: int):
    n = 2 * nw
    best = None
    for lp in itertools.permutations(range(nw)):
        for fl in itertools.product((0, 1), repeat=nw):
            m = [0] * n
            for w in range(nw):
                x, y = 2 * lp[w], 2 * lp[w] + 1
                if fl[w]:
                    x, y = y, x
                m[2 * w], m[2 * w + 1] = x, y
            sig = (m[a], m[b],
                   tuple(sorted((m[v], m[w]) for v, w in tau.items())))
            if best is None or sig < best:
                best = sig
    return best


def count_sigma_brute_force(order: int, spin: int = 2) -> int:
    """G2v sigma diagram count (matches diagram_count.count_sigma_G2v)."""
    total = 0
    for a, b, tau in sigma_topologies(order):
        on_path = set()
        x = a
        while True:
            on_path.add(x)
            if x == b:
                break
            x = tau[x]
        seen = set(on_path)
        free = 0
        for v in range(2 * order):
            if v in seen:
                continue
            x = v
            any_new = False
            while x not in seen:
                seen.add(x)
                any_new = True
                x = tau[x]
            if any_new:
                free += 1
        total += spin ** free
    return total
