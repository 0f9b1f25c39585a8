"""Cluster updates: Wolff space-time clusters and Swendsen-Wang-style bath
clusters, re-formulated for parallel hardware.

The reference grows clusters with a sequential stack (qmc.pyx:711-786,
907-996, 1114-1221, 1400-1446, 1556-1612) — inherently serial. The TPU
formulation splits each cluster update into data-parallel stages:

  1. Bond draw: every candidate bond of the space-time interaction graph is
     drawn independently with the reference's bond probability
     p = 1 - exp(dE_bond / T_eff) (bonds only between spins equal to the
     seed sign, as in the reference's `confs[..] == k` gate).
  2. Connected components: iterative min-label propagation over the active
     bond graph inside a `lax.while_loop` (fixed point in O(cluster
     diameter) steps), or — for the per-spin imaginary-time bath graphs of
     the WC2/WC3 variants (P x P, P <= 64) — transitive closure by log2(P)
     squarings of the boolean adjacency, batched over spins on the MXU.
  3. Flip the seed's component (Wolff), or Metropolis-accept the whole
     component with its exact set-flip energy (SW-bath variants).

Known deviations from the reference, by design (SURVEY.md §7 "hard parts"):
  * The WCL cumulative damping factor r *= p (qmc.pyx:730-731) makes bond
    draws order-dependent and has no parallel analog; we use r = 1 (the
    standard Wolff rule, which the reference's own WC variant also uses —
    its damping is commented out at qmc.pyx:1149,1180,1216). Validated
    statistically, not bitwise.
  * Directed bond probabilities (the bias term uses the candidate end) are
    OR-combined over the two directions of an undirected edge.
  * WC2's inverted accept test (flips *more* when exp(-dE/T) > u,
    qmc.pyx:1442-1446, section marked "function under test" at
    qmc.pyx:612-614) is replaced by the correct Metropolis rule that its
    sibling WC3 uses (qmc.pyx:1617-1621); WC2's bath-distance indexing slip
    (bslice vs islice, qmc.pyx:1368-1371) is likewise not replicated.
  * The reference's WCL never flips the cluster seed (the seed flip is
    commented out at qmc.pyx:701 while joined members flip on entry); here
    the full component including the seed flips — standard Wolff.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from montecarlosolvers_tpu.schedules import jperp as jperp_of
from montecarlosolvers_tpu.ops.piqmc import bath_matrix


def _bond_prob(de, teff):
    """p = 1 - exp(dE/T_eff) for dE < 0, else 0 (qmc.pyx:727-728)."""
    return jnp.where(de < 0.0, 1.0 - jnp.exp(de / teff), 0.0)


def _mirror_upper(u):
    """Symmetrize per-pair uniforms over the last two axes by mirroring the
    upper triangle — each undirected pair gets exactly ONE draw (taking a
    min would inflate the bond probability to 1-(1-p)^2)."""
    n = u.shape[-1]
    r = jnp.arange(n)
    upper = r[:, None] < r[None, :]
    return jnp.where(upper, u, jnp.swapaxes(u, -1, -2))


# --------------------------------------------------------------------------
# Full space-time Wolff cluster (QuantumAnnealWCL / QuantumAnnealWC)
# --------------------------------------------------------------------------

def _label_components(labels, active_sp, nbr_idx, active_up, active_bath=None):
    """Min-label propagation to a fixed point.

    labels: (P, N) int32 initial labels (flat index).
    active_sp: (P, N, maxnb) bool — spatial bond active (undirected; an
      active slot propagates labels both ways).
    nbr_idx: (N, maxnb) int32.
    active_up: (P, N) bool — temporal bond between slice k and k+1 (mod P).
    active_bath: optional (N, P, P) bool — all-distance imaginary-time bath
      bonds per spin line (dissipative WCL, qmc.pyx:907-927).
    """
    big = jnp.iinfo(jnp.int32).max

    def relax(labels):
        # Spatial: pull labels across active slots, and push (scatter-min)
        # so one directed draw connects both endpoints.
        lab_nb = jnp.take(labels, nbr_idx, axis=1)  # (P, N, maxnb)
        pulled = jnp.min(jnp.where(active_sp, lab_nb, big), axis=-1)
        pushed_src = jnp.where(active_sp, labels[:, :, None], big)
        pushed = (
            jnp.full_like(labels, big)
            .at[:, nbr_idx.reshape(-1)]
            .min(pushed_src.reshape(labels.shape[0], -1))
        )
        # Temporal ring: edge k <-> k+1 active via active_up[k].
        up = jnp.where(active_up, jnp.roll(labels, -1, axis=0), big)
        dn_active = jnp.roll(active_up, 1, axis=0)
        dn = jnp.where(dn_active, jnp.roll(labels, 1, axis=0), big)
        new = jnp.minimum(
            jnp.minimum(labels, pulled), jnp.minimum(pushed, jnp.minimum(up, dn))
        )
        if active_bath is not None:
            # labels: (P, N); bath pulls across any slice pair of one line.
            lab_t = labels.T  # (N, P)
            bath_min = jnp.min(
                jnp.where(active_bath, lab_t[:, None, :], big), axis=-1
            )  # (N, P)
            new = jnp.minimum(new, bath_min.T)
        return new

    def cond(state):
        labels, prev_changed = state
        return prev_changed

    def body(state):
        labels, _ = state
        new = relax(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.array(True)))
    return labels


def wolff_update(problem, confs, key, temp, gamma, b, rule="local",
                 lookuptable=None):
    """One Wolff cluster update on an unbatched (P, N) configuration.

    rule="local": bond energies from the pair interaction only
      (QuantumAnnealWCL, qmc.pyx:715-782): spatial dE = 2 B J_ij + bias_j,
      temporal dE = -2 jperp + bias_i, bias_x = -2 B h_x k.
    rule="full": bond energies from the candidate's full local energy change
      (QuantumAnnealWC, qmc.pyx:1124-1221).
    lookuptable: optional (P-1,) bath couplings — adds all-distance
      imaginary-time bath bonds with dE = -2 T_eff lut[d-1] + bias to the
      growth (DissaptiveQuantumAnnealWCL, qmc.pyx:907-927).

    vmap over a leading chain axis for batched states.
    """
    slices, nspins = confs.shape
    teff = temp * slices
    jp = jperp_of(gamma, teff)

    k_seed_key, k_sp, k_t, k_site, k_bath = jax.random.split(key, 5)
    seed_spin = jax.random.randint(k_seed_key, (), 0, nspins)
    seed_slice = jax.random.randint(k_site, (), 0, slices)
    kval = confs[seed_slice, seed_spin]

    s = confs.astype(jnp.float32)
    same = confs == kval  # only seed-sign spins can join (qmc.pyx:717)
    bias = -2.0 * b * problem.h * kval  # per candidate spin (qmc.pyx:723-726)

    if rule == "local":
        de_sp = 2.0 * b * problem.nbr_J + bias[problem.nbr_idx]  # (N, maxnb)
        de_sp = jnp.broadcast_to(de_sp, (slices,) + de_sp.shape)
        de_t = jnp.broadcast_to((-2.0 * jp + bias)[None, :], (slices, nspins))
    else:
        # Candidate j at slice t: its full single-flip dE on the current
        # config (sign fixed to the seed sign k, qmc.pyx:1124-1148).
        field = problem.local_fields(s)  # (P, N)
        up = jnp.roll(s, 1, axis=0)
        dn = jnp.roll(s, -1, axis=0)
        de_site = -2.0 * b * kval * field + 2.0 * jp * kval * (up + dn)  # (P, N)
        de_sp = jnp.take(de_site, problem.nbr_idx, axis=1)  # (P, N, maxnb)
        # temporal candidate is the same spin at the adjacent slice
        de_t = jnp.roll(de_site, -1, axis=0)

    p_sp = _bond_prob(de_sp, teff)
    p_t = _bond_prob(de_t, teff)

    u_sp = jax.random.uniform(k_sp, p_sp.shape)
    u_t = jax.random.uniform(k_t, p_t.shape)

    nb_same = jnp.take(same, problem.nbr_idx, axis=1)  # (P, N, maxnb)
    pad = problem.nbr_idx == jnp.arange(nspins)[:, None]  # self slots
    active_sp = same[:, :, None] & nb_same & (u_sp < p_sp) & (~pad)[None, :, :]
    same_up = jnp.roll(same, -1, axis=0)
    active_up = same & same_up & (u_t < p_t)

    active_bath = None
    if lookuptable is not None:
        lut = jnp.asarray(lookuptable)
        off = (jnp.arange(slices)[None, :] - jnp.arange(slices)[:, None]) % slices
        de_b = -2.0 * teff * lut[jnp.maximum(off - 1, 0)] + 0.0
        de_b = de_b[None, :, :] + bias[:, None, None]  # (N, P, P)
        p_b = jnp.where(off[None] > 0, _bond_prob(de_b, teff), 0.0)
        u_b = jax.random.uniform(k_bath, (nspins, slices, slices))
        u_b = _mirror_upper(u_b)  # one draw per undirected pair
        same_t = same.T  # (N, P)
        active_bath = (u_b < p_b) & same_t[:, :, None] & same_t[:, None, :]

    labels0 = jnp.arange(slices * nspins, dtype=jnp.int32).reshape(slices, nspins)
    labels = _label_components(
        labels0, active_sp, problem.nbr_idx, active_up, active_bath
    )
    comp = labels == labels[seed_slice, seed_spin]
    return jnp.where(comp & same, -confs, confs)


# --------------------------------------------------------------------------
# Bath-bond imaginary-time clusters (WC2 / WC3 family)
# --------------------------------------------------------------------------

def _time_closure(adj):
    """Transitive closure of (..., P, P) boolean adjacency by repeated
    squaring on the MXU (log2(P) matmuls)."""
    P = adj.shape[-1]
    a = adj.astype(jnp.float32) + jnp.eye(P, dtype=jnp.float32)
    n_iter = max(1, int(np.ceil(np.log2(max(P, 2)))))
    for _ in range(n_iter):
        a = jnp.minimum(
            jnp.einsum("...ij,...jk->...ik", a, a, preferred_element_type=jnp.float32),
            1.0,
        )
    return a > 0.0


def _line_set_flip_de(problem, confs, spin_field, flip_mask, b, jp, teff, bath_mat):
    """Exact energy change of flipping the slice-set `flip_mask` of every
    spin line simultaneously (evaluated per spin; neighbors held fixed).

    confs: (P, N); spin_field: (P, N) intra-slice fields (J s + h);
    flip_mask: (P, N) bool. Returns (N,) dE per line.
    """
    s = confs.astype(jnp.float32)
    t = jnp.where(flip_mask, -s, s)
    # Linear (intra-slice) part: E_lin = B sum_k field_k s_k per line.
    de = b * jnp.sum(spin_field * (t - s), axis=0)
    # Trotter ring: E_trot = -jperp sum_k s_k s_{k+1}.
    de = de - jp * jnp.sum(
        t * jnp.roll(t, -1, axis=0) - s * jnp.roll(s, -1, axis=0), axis=0
    )
    # Bath: E_bath = -(teff/2) s^T L s per line, L from the lookup table.
    if bath_mat is not None:
        qt = jnp.einsum("pn,pq,qn->n", t, bath_mat, t)
        qs = jnp.einsum("pn,pq,qn->n", s, bath_mat, s)
        de = de - 0.5 * teff * (qt - qs)
    return de


def bath_cluster_phase(problem, confs, key, temp, gamma, b, lookuptable,
                       seed_slices, color_mask, bath_mat):
    """One parallel phase of SW-style bath-bond cluster moves.

    For every spin in `color_mask`, grow a cluster along imaginary time using
    only bath bonds with p = 1 - exp(-2 lut[d-1]) (qmc.pyx:1400-1405), then
    Metropolis-accept the whole cluster with its exact set-flip energy
    (WC3 rule, qmc.pyx:1617-1621).

    confs: (P, N). seed_slices: (N,) int32 seed slice per spin.
    """
    slices, nspins = confs.shape
    teff = temp * slices
    jp = jperp_of(gamma, teff)
    lut = jnp.asarray(lookuptable)

    k_bond, k_acc = jax.random.split(key)

    # Bond probabilities by ring distance (symmetric, distance-only).
    off = (jnp.arange(slices)[None, :] - jnp.arange(slices)[:, None]) % slices
    p_pair = jnp.where(off > 0, 1.0 - jnp.exp(-2.0 * lut[jnp.maximum(off - 1, 0)]), 0.0)

    kval = jnp.take_along_axis(confs, seed_slices[None, :], axis=0)[0]  # (N,)
    same = confs == kval[None, :]  # (P, N)

    u = jax.random.uniform(k_bond, (nspins, slices, slices))
    u = _mirror_upper(u)  # one draw per undirected pair
    adj = (u < p_pair[None, :, :]) & same.T[:, :, None] & same.T[:, None, :]

    closure = _time_closure(adj)  # (N, P, P)
    seed_onehot = jax.nn.one_hot(seed_slices, slices, dtype=jnp.bool_)  # (N, P)
    comp = jnp.einsum("npq,np->nq", closure.astype(jnp.float32),
                      seed_onehot.astype(jnp.float32)) > 0.0  # (N, P)
    comp = comp.T & same  # (P, N)

    field = problem.local_fields(confs.astype(jnp.float32))
    de = _line_set_flip_de(problem, confs, field, comp & color_mask[None, :],
                           b, jp, teff, bath_mat)
    u_acc = jax.random.uniform(k_acc, (nspins,))
    accept = ((de <= 0.0) | (u_acc < jnp.exp(-de / teff))) & color_mask
    return jnp.where(comp & accept[None, :], -confs, confs)


def sw_bath_sweep(problem, confs, key, temp, gamma, b, lookuptable,
                  per_slice_seeds=False):
    """Full SW-bath cluster sweep over all spins.

    per_slice_seeds=False: one random seed slice per spin (WC2 outer loop,
    qmc.pyx:1390-1398). True: every slice seeds in turn (WC3, qmc.pyx:1546).
    Spins are processed per spatial color class so concurrent line flips
    never share an interaction.
    """
    slices, nspins = confs.shape
    bath_mat = bath_matrix(lookuptable, slices)
    if per_slice_seeds:
        for isl in range(slices):
            seeds = jnp.full((nspins,), isl, dtype=jnp.int32)
            for c in range(problem.num_colors):
                key, sub = jax.random.split(key)
                confs = bath_cluster_phase(
                    problem, confs, sub, temp, gamma, b, lookuptable,
                    seeds, problem.color_masks[c], bath_mat,
                )
    else:
        key, kseed = jax.random.split(key)
        seeds = jax.random.randint(kseed, (nspins,), 0, slices)
        for c in range(problem.num_colors):
            key, sub = jax.random.split(key)
            confs = bath_cluster_phase(
                problem, confs, sub, temp, gamma, b, lookuptable,
                seeds, problem.color_masks[c], bath_mat,
            )
    return confs
