"""Vocabulary tree with inverted file and Bayesian loop filtering.

Semantics from /root/reference/src/voctree_bf.h (template
voctree_t<K=40, L=3, D=72>):

* descent metric dist = 1 - dot(f0, f1) on normalized descriptors
  (voctree_bf.h:102-109); greedy per-level argmin (find_leaf, :181-195);
* document insertion with an N-frame quarantine queue so recent frames are
  not matched (NUM_NON_CONSIDER_RECENT_FRAMES, :199-244); per-leaf doc
  weights += 1/featcnt (:246-268);
* tf-idf weighted L1 similarity scoring with a virtual "average document"
  occupying the top-numavgwords most-populated leaves (:381-558).  The
  reference's inner scoring loop re-multiplies the query term frequency by
  the idf once per document sharing the leaf (``n *= log10(...)`` inside the
  doc loop, :461) — an accumulation bug; we implement the intended
  ``n_idf = n * idf`` per leaf;
* likelihood: score > mean + 2*sigma -> (score - 2*sigma)/mean, else 1
  (:517-534);
* Bayesian temporal filter over loop states {-1, 0..N-1} with a Gaussian
  transition table (trans_prob :560-587, calc_post_prob :589-706);
* loop acceptance: a >= seqlen-consecutive-document posterior run summing
  >= threshold (isLoopClosing :708-748), with the indoor parameter preset
  (:24-29) as default (outdoor presets :31-43 via the classmethods).

TPU mapping (SURVEY §2 #16).  The reference's inverted file is a
leaf -> {doc: weight} hash walked in nested Python-equivalent loops —
O(docs^2) per keyframe through the Bayes filter.  Here every per-query
computation is a fixed-shape dense kernel:

* quantization: batched 3-level gather + (F, K, D) x (D,) dot-product
  argmax, descriptors padded to capacity buckets (no per-frame-shape
  recompiles);
* scoring: documents are rows of a (D, F) leaf/weight table; the
  tf-idf L1 similarity of the query against EVERY document (plus the
  virtual average document) is one masked equality-einsum — the
  segment-sum reformulation of the inverted file;
* the Bayes recursion: the Gaussian transition is a 1-D convolution over
  the posterior vector — one jitted update per keyframe.

Only insertion bookkeeping (quarantine queue, leaf population counts)
stays host-side; it is O(features) per keyframe.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BRANCH_FACTOR = 40
LEVELS = 3
DESC_DIM = 72

_FEAT_BUCKETS = (32, 64, 128, 256, 512, 1024)
_GAUSS_REACH = 10      # trans_prob cuts the Gaussian at dist >= 10 (:584)


def _bucket(n, buckets=_FEAT_BUCKETS):
    for b in buckets:
        if n <= b:
            return b
    # past the last bucket: round up to the next power of two rather than
    # silently capping (a silent cap made callers' fixed-shape scatters
    # raise broadcast errors at high feature counts; ADVICE r3)
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class VocTreeParams:
    """Indoor preset (voctree_bf.h:24-29); outdoor variants :31-43 via
    the factory classmethods."""

    non_consider_recent: int = 40
    sigma: float = 1.0
    threshold: float = 0.7
    consider_seq_length: int = 10
    num_avg_words: int = 50

    @classmethod
    def indoor(cls) -> "VocTreeParams":
        """voctree_bf.h:24-29 (the compiled-in default)."""
        return cls()

    @classmethod
    def outdoor(cls) -> "VocTreeParams":
        """voctree_bf.h:31-36."""
        return cls(non_consider_recent=100, sigma=0.8, threshold=0.8,
                   consider_seq_length=15)

    @classmethod
    def outdoor_long_loop(cls) -> "VocTreeParams":
        """voctree_bf.h:38-43."""
        return cls(non_consider_recent=300, sigma=0.8, threshold=0.5,
                   consider_seq_length=5)


@jax.jit
def _descend(centroids, feats, valid):
    """Batched greedy tree descent.

    centroids: (num_int, K, D) internal-node centroid blocks.
    feats: (F, D) normalized descriptors (rows past `valid` are padding).
    Returns (F,) leaf indices in global node numbering.
    """
    idx = jnp.zeros(feats.shape[0], jnp.int32)      # root for every feature
    K = centroids.shape[1]
    for _ in range(LEVELS):
        blocks = centroids[idx]                     # (F, K, D)
        # dist = 1 - dot  =>  argmin dist == argmax dot
        dots = jnp.einsum("fkd,fd->fk", blocks, feats)
        best = jnp.argmax(dots, axis=1).astype(jnp.int32)
        idx = idx * K + best + 1                    # child_idx (:99)
    return jnp.where(valid, idx, -1)


@functools.partial(jax.jit, static_argnames=("num_avg",))
def _score_query(doc_leaves, doc_weights, doc_valid, q_leaves, q_counts,
                 q_valid, leaf_pop, avg_leaves, have_avg, doc_size,
                 featcnt, num_avg):
    """tf-idf L1 scoring of one query against every document + the virtual
    average document (query_doc, voctree_bf.h:381-558), as dense masked
    reductions.

    doc_leaves/doc_weights: (D, F) per-document unique leaves (-1 pad) and
      their weights (count_in_doc / featcnt).
    q_leaves/q_counts: (Q,) unique query leaves and their multiplicities.
    leaf_pop: (num_leaf,) number of real documents containing each leaf.
    avg_leaves: (num_avg,) the average document's leaves (top-populated).
    Returns (scores (D,), avg_score, hit (D,), likelihood (D,), avg_lhood).
    """
    f = doc_weights.dtype

    # docs-per-leaf for the query's leaves, counting the average document
    # as a member of its leaves (the reference re-inserts doc -1 into the
    # inverted file before scoring, so idf denominators include it)
    q_safe = jnp.maximum(q_leaves, 0)
    in_avg = jnp.any(q_leaves[:, None] == avg_leaves[None, :], axis=1)
    n_docs_leaf = leaf_pop[q_safe] + jnp.where(
        jnp.logical_and(have_avg, in_avg), 1, 0)
    has_docs = jnp.logical_and(q_valid, n_docs_leaf > 0)

    n_docs_total = doc_size + jnp.where(have_avg, 1, 0)
    idf = jnp.log10(n_docs_total.astype(f)
                    / jnp.maximum(n_docs_leaf, 1).astype(f))
    idf = jnp.where(has_docs, idf, 0.0)
    n_idf = (q_counts.astype(f) / featcnt.astype(f)) * idf      # (Q,)

    # real documents: (Q, D, F) leaf-equality mask -> per (query-leaf, doc)
    # matched weight m = weight * idf
    eq = jnp.logical_and(
        q_leaves[:, None, None] == doc_leaves[None, :, :],
        has_docs[:, None, None])                                 # (Q,D,F)
    m = jnp.sum(jnp.where(eq, doc_weights[None, :, :], 0.0), axis=2)
    m = m * idf[:, None]                                         # (Q,D)
    touched = jnp.any(eq, axis=2)                                # (Q,D)
    n_b = n_idf[:, None]
    l1 = jnp.where(touched, -(jnp.abs(n_b - m) - n_b - m), 0.0)
    scores = jnp.sum(l1, axis=0) * doc_valid.astype(f)           # (D,)
    hit = jnp.logical_and(jnp.any(touched, axis=0), doc_valid)

    # the average document: weight 1/num_avg at each of its leaves
    eq_a = jnp.logical_and(
        q_leaves[:, None] == avg_leaves[None, :],
        has_docs[:, None])                                       # (Q,A)
    m_a = jnp.sum(jnp.where(eq_a, 1.0 / num_avg, 0.0), axis=1) * idf
    touched_a = jnp.any(eq_a, axis=1)
    l1_a = jnp.where(touched_a, -(jnp.abs(n_idf - m_a) - n_idf - m_a), 0.0)
    avg_score = jnp.sum(l1_a) * jnp.where(have_avg, 1.0, 0.0).astype(f)
    avg_hit = jnp.logical_and(have_avg, jnp.any(touched_a))

    # mean fill-in for untouched docs (n_docs_hit starts at 1, :446)
    total = jnp.sum(scores) + avg_score
    n_hit = 1 + jnp.sum(hit.astype(jnp.int32)) + avg_hit.astype(jnp.int32)
    mean_fill = total / n_hit.astype(f)
    scores = jnp.where(jnp.logical_and(doc_valid, ~hit), mean_fill, scores)
    avg_score = jnp.where(jnp.logical_and(have_avg, ~avg_hit), mean_fill,
                          avg_score)

    # likelihood transform (:517-534) over {avg} + all real docs
    nd = jnp.sum(doc_valid.astype(f)) + jnp.where(have_avg, 1.0, 0.0)
    nd = jnp.maximum(nd, 1.0)
    s_sum = jnp.sum(jnp.where(doc_valid, scores, 0.0)) \
        + jnp.where(have_avg, avg_score, 0.0)
    s_sq = jnp.sum(jnp.where(doc_valid, scores * scores, 0.0)) \
        + jnp.where(have_avg, avg_score * avg_score, 0.0)
    mean = s_sum / nd
    std = jnp.sqrt(jnp.maximum(s_sq / nd - mean * mean, 0.0))

    def lhood(s):
        take = jnp.logical_and(s > mean + 2.0 * std, mean != 0.0)
        return jnp.where(take, (s - 2.0 * std) / mean, 1.0)

    return scores, avg_score, hit, lhood(scores), lhood(avg_score)


@jax.jit
def _posterior_update(prev, lhood_docs, lhood_avg, doc_valid, gauss):
    """calc_post_prob (voctree_bf.h:589-706) as one vector update.

    prev: (D+1,) posterior [state -1, doc 0, doc 1, ...].
    gauss: (2*_GAUSS_REACH-1,) Gaussian taps for |i-j| < _GAUSS_REACH.
    """
    f = prev.dtype
    n = jnp.maximum(jnp.sum(doc_valid.astype(f)), 1.0)
    p_no = prev[0]
    p_docs = prev[1:] * doc_valid.astype(f)

    # state -1: 0.9 from -1, 0.1 from any doc (:566-575)
    bel_no = 0.9 * p_no + 0.1 * jnp.sum(p_docs)
    # state i: 0.1/n from -1, gauss(|i-j|) from doc j (:577-586)
    conv = jnp.convolve(p_docs, gauss, mode="same")
    bel = p_no * (0.1 / n) + conv

    post = jnp.concatenate([(lhood_avg * bel_no)[None], lhood_docs * bel])
    post = post * jnp.concatenate([jnp.ones((1,), bool),
                                   doc_valid]).astype(f)
    eta = jnp.sum(post)
    nstates = 1.0 + jnp.sum(doc_valid.astype(f))
    uniform = jnp.concatenate([jnp.ones((1,), bool),
                               doc_valid]).astype(f) / nstates
    return jnp.where(eta > 0, post / jnp.maximum(eta, 1e-300), uniform)


class VocTree:
    def __init__(self, centroids: np.ndarray,
                 params: Optional[VocTreeParams] = None,
                 doc_capacity: int = 128, feat_capacity: int = 256):
        """centroids: (num_int, K, D) float32."""
        K = BRANCH_FACTOR
        self.num_int = 1 + K + K * K
        self.num_leaf = K ** LEVELS
        assert centroids.shape == (self.num_int, K, DESC_DIM), \
            centroids.shape
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.params = params or VocTreeParams()

        # fixed-capacity document table (grows by doubling)
        self._cap_docs = doc_capacity
        self._cap_feat = feat_capacity
        self._doc_leaves = np.full((doc_capacity, feat_capacity), -1,
                                   np.int32)
        self._doc_weights = np.zeros((doc_capacity, feat_capacity),
                                     np.float32)
        self._leaf_pop = np.zeros(self.num_leaf, np.int32)
        self.doc_size = 0
        # quarantine queue of (doc_id, feats)
        self._buffer: List[Tuple[int, np.ndarray]] = []
        # Gaussian taps (voctree_bf.h:156-160) for |i-j| < _GAUSS_REACH
        s = self.params.sigma
        d = np.abs(np.arange(-(_GAUSS_REACH - 1), _GAUSS_REACH))
        self._gauss = jnp.asarray(
            (1.0 / math.sqrt(2 * math.pi * s * s)
             * np.exp(-(d * d) / (2 * s * s))), jnp.float32)
        # posterior over [no-loop, doc 0, doc 1, ...]; zeros = the
        # reference's empty prior (first update comes out uniform)
        self._post = None

    # -- persistence (reference binary format, voctree_bf.h:117-143) -------

    @staticmethod
    def load(path: str, params: Optional[VocTreeParams] = None) -> "VocTree":
        K = BRANCH_FACTOR
        num_int = 1 + K + K * K
        data = np.fromfile(path, dtype=np.float32,
                           count=num_int * K * DESC_DIM)
        if data.size < num_int * K * DESC_DIM:
            raise ValueError(f"truncated vocabulary file: {path}")
        return VocTree(data.reshape(num_int, K, DESC_DIM), params)

    def save(self, path: str):
        np.asarray(self.centroids, np.float32).tofile(path)

    # -- quantization ------------------------------------------------------

    def find_leaves(self, feats: np.ndarray) -> np.ndarray:
        """(F, D) descriptors -> (F,) leaf indices (0-based leaf numbering).

        Descriptors are padded to a capacity bucket so the jitted descent
        compiles once per bucket, not once per frame."""
        n = len(feats)
        if n == 0:
            return np.zeros(0, np.int32)
        Fb = _bucket(n)
        fp = np.zeros((Fb, DESC_DIM), np.float32)
        fp[:n] = np.asarray(feats, np.float32)[:, :DESC_DIM]
        valid = np.zeros(Fb, bool)
        valid[:n] = True
        idx = np.asarray(_descend(self.centroids, jnp.asarray(fp),
                                  jnp.asarray(valid)))[:n]
        return idx - self.num_int  # leaf_idx (:101)

    # -- document insertion (with quarantine) ------------------------------

    def _grow(self, need_docs):
        while self._cap_docs < need_docs:
            self._cap_docs *= 2
        dl = np.full((self._cap_docs, self._cap_feat), -1, np.int32)
        dw = np.zeros((self._cap_docs, self._cap_feat), np.float32)
        dl[:self.doc_size] = self._doc_leaves[:self.doc_size]
        dw[:self.doc_size] = self._doc_weights[:self.doc_size]
        self._doc_leaves, self._doc_weights = dl, dw
        if self._post is not None:
            p = np.zeros(self._cap_docs + 1, np.float32)
            p[:len(self._post)] = self._post
            self._post = p

    def insert_doc(self, doc_id: Optional[int],
                   feats: np.ndarray) -> Optional[int]:
        """Queue the document; once more than non_consider_recent documents
        are queued, the oldest is actually inserted.  Returns the doc id
        that entered the index this call (or None).  Passing doc_id=None
        flushes one queued document (reference doc_id == -2, :216).

        Note: documents must be inserted in id order (ids are row indices
        of the dense table — the engine inserts keyframes sequentially)."""
        if doc_id is not None:
            self._buffer.append((doc_id, np.asarray(feats, np.float32)))

        flush = (len(self._buffer) > self.params.non_consider_recent
                 or (doc_id is None and self._buffer))
        if not flush:
            return None

        ins_id, ins_feats = self._buffer.pop(0)
        if ins_id != self.doc_size:
            raise ValueError(
                f"documents must insert sequentially: got id {ins_id}, "
                f"expected {self.doc_size}")
        if ins_id + 1 > self._cap_docs:
            self._grow(ins_id + 1)
        if len(ins_feats) == 0:
            # featureless keyframe: keep the id sequence dense with an
            # empty row (no leaves, no population).  The reference would
            # divide by featcnt==0 here (voctree_bf.h:246-268) — empty
            # documents are simply out of its contract.
            self.doc_size += 1
            return ins_id

        w = 1.0 / len(ins_feats)
        leaves = self.find_leaves(ins_feats)
        uniq, cnt = np.unique(leaves, return_counts=True)
        k = min(len(uniq), self._cap_feat)
        self._doc_leaves[ins_id, :k] = uniq[:k]
        self._doc_weights[ins_id, :k] = cnt[:k] * w
        self._leaf_pop[uniq[:k]] += 1
        self.doc_size += 1
        return ins_id

    # -- querying ----------------------------------------------------------

    def _avg_doc(self):
        """Virtual average document: top num_avg_words most-populated
        leaves, weight 1/num_avg_words each (:404-441)."""
        A = self.params.num_avg_words
        populated = np.flatnonzero(self._leaf_pop > 0)
        if len(populated) <= A:
            return np.full(A, -1, np.int32), False
        top = populated[np.argpartition(-self._leaf_pop[populated], A)[:A]]
        out = np.full(A, -1, np.int32)
        out[:len(top)] = top
        return out, True

    def query(self, feats: np.ndarray):
        """Returns (scores {doc: score}, likelihood {doc: l}) — the virtual
        average document is doc -1, as in the reference.

        One jitted dense kernel scores the query against every document
        (query_doc, voctree_bf.h:381-558)."""
        if len(feats) == 0 or self.doc_size == 0:
            return {}, {}

        leaves = self.find_leaves(feats)
        uniq, cnt = np.unique(leaves, return_counts=True)
        Qb = _bucket(len(uniq))
        ql = np.full(Qb, -1, np.int32)
        qc = np.zeros(Qb, np.int32)
        qv = np.zeros(Qb, bool)
        ql[:len(uniq)] = uniq
        qc[:len(uniq)] = cnt
        qv[:len(uniq)] = True

        avg_leaves, have_avg = self._avg_doc()
        doc_valid = np.zeros(self._cap_docs, bool)
        doc_valid[:self.doc_size] = True

        scores, avg_s, hit, lh, avg_lh = _score_query(
            jnp.asarray(self._doc_leaves), jnp.asarray(self._doc_weights),
            jnp.asarray(doc_valid), jnp.asarray(ql), jnp.asarray(qc),
            jnp.asarray(qv), jnp.asarray(self._leaf_pop),
            jnp.asarray(avg_leaves), jnp.asarray(have_avg),
            jnp.asarray(self.doc_size, jnp.int32),
            jnp.asarray(len(feats), jnp.int32),
            num_avg=self.params.num_avg_words)

        self._last = (np.asarray(scores), float(avg_s), np.asarray(lh),
                      float(avg_lh), bool(have_avg))
        n = self.doc_size
        s = {-1: float(avg_s)} if have_avg else {}
        l = {-1: float(avg_lh)} if have_avg else {}
        sa = np.asarray(scores)
        la = np.asarray(lh)
        for d in range(n):
            s[d] = float(sa[d])
            l[d] = float(la[d])
        return s, l

    # -- Bayesian temporal filter ------------------------------------------

    def update_posterior(self, likelihood: Dict[int, float]
                         ) -> Dict[int, float]:
        """calc_post_prob (voctree_bf.h:589-706): one jitted vector update
        (Gaussian transition = 1-D convolution over the doc axis)."""
        n = self.doc_size
        if n == 0:
            return {}
        lh = np.ones(self._cap_docs, np.float32)
        for d, v in likelihood.items():
            if 0 <= d < self._cap_docs:
                lh[d] = v
        lh_avg = likelihood.get(-1, 1.0)
        doc_valid = np.zeros(self._cap_docs, bool)
        doc_valid[:n] = True

        if self._post is None or len(self._post) != self._cap_docs + 1:
            p = np.zeros(self._cap_docs + 1, np.float32)
            if self._post is not None:
                p[:len(self._post)] = self._post
            self._post = p
        # NOTE the reference starts the recursion from an EMPTY prior: all
        # beliefs are 0, eta == 0, and the first update comes out uniform
        # over the states (voctree_bf.h:660-668,697-703).  The zero vector
        # reproduces that through the eta==0 branch of _posterior_update.

        post = _posterior_update(jnp.asarray(self._post),
                                 jnp.asarray(lh, jnp.float32),
                                 jnp.asarray(lh_avg, jnp.float32),
                                 jnp.asarray(doc_valid),
                                 self._gauss)
        self._post = np.asarray(post)
        out = {-1: float(self._post[0])}
        for d in range(n):
            out[d] = float(self._post[1 + d])
        return out

    def is_loop_closing(self, lc_prob: Dict[int, float]) -> Optional[int]:
        """isLoopClosing (voctree_bf.h:708-748): accept when a run of
        consecutive documents accumulates >= threshold posterior.  Dense
        doc ids have no gaps, so the run test is a sliding-window sum."""
        p = self.params
        if self.doc_size < p.non_consider_recent:
            return None
        n = self.doc_size
        if self._post is None or n == 0:
            return None
        probs = self._post[1:1 + n].astype(np.float64)
        w = p.consider_seq_length + 1
        if n < w:
            return None
        csum = np.concatenate([[0.0], np.cumsum(probs)])
        window = csum[w:] - csum[:-w]              # sum over [i, i+w)
        best = int(np.argmax(window))
        if window[best] >= p.threshold:
            seg = probs[best:best + w]
            return best + int(np.argmax(seg))
        return None

    def reset_filter(self):
        if self._post is not None:
            self._post[:] = 0.0


# ---------------------------------------------------------------------------
# vocabulary training (the reference loads a prebuilt binary; we can build)
# ---------------------------------------------------------------------------

_MIN_SAMPLES_PER_CLUSTER = 6


def _kmeans(feats: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Spherical k-means (dist = 1 - dot on normalized vectors).

    Sparse nodes cap their effective cluster count at
    ``n // _MIN_SAMPLES_PER_CLUSTER``: when a node holds fewer samples
    than cluster slots, unconstrained k-means shatters each descriptor's
    observation-noise ball into singleton leaves and requantization
    becomes a coin flip (measured: two noisy copies of the same
    descriptor agreed on a leaf only ~40% of the time on a 1000-word
    corpus under a 64000-leaf tree).  Classic vocabulary-tree practice
    is to stop splitting sparse nodes; unused centroid slots are filled
    with duplicates of the first centers, which argmax resolves to the
    lowest index — deterministic, so they change nothing.
    """
    n = len(feats)
    if n == 0:
        c = rng.standard_normal((k, feats.shape[1] if feats.ndim == 2
                                 else DESC_DIM)).astype(np.float32)
        return c / np.linalg.norm(c, axis=1, keepdims=True)
    k_eff = max(1, min(k, n // _MIN_SAMPLES_PER_CLUSTER))
    centers = feats[rng.choice(n, size=min(k_eff, n),
                               replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(feats @ centers.T, axis=1)
        for j in range(len(centers)):
            sel = feats[assign == j]
            if len(sel):
                c = sel.mean(axis=0)
                nc = np.linalg.norm(c)
                if nc > 0:
                    centers[j] = c / nc
    if len(centers) < k:
        pad = centers[np.arange(k - len(centers)) % len(centers)]
        centers = np.concatenate([centers, pad])
    return centers


def build_vocabulary(descriptors: np.ndarray, seed: int = 0,
                     kmeans_iters: int = 8) -> np.ndarray:
    """Hierarchical spherical k-means -> (num_int, K, D) centroid table.

    descriptors: (N, 72) normalized training descriptors.
    """
    K = BRANCH_FACTOR
    rng = np.random.default_rng(seed)
    descriptors = np.asarray(descriptors, np.float32)
    num_int = 1 + K + K * K
    cents = np.zeros((num_int, K, DESC_DIM), np.float32)

    # level 0: root
    cents[0] = _kmeans(descriptors, K, kmeans_iters, rng)
    assign0 = np.argmax(descriptors @ cents[0].T, axis=1)

    # level 1
    for i in range(K):
        node = 0 * K + i + 1
        sel = descriptors[assign0 == i]
        cents[node] = _kmeans(sel, K, kmeans_iters, rng)
    # level 2
    for i in range(K):
        sel_i = descriptors[assign0 == i]
        node_i = i + 1
        assign1 = (np.argmax(sel_i @ cents[node_i].T, axis=1)
                   if len(sel_i) else np.zeros(0, int))
        for j in range(K):
            node = node_i * K + j + 1
            sel = sel_i[assign1 == j] if len(sel_i) else sel_i
            cents[node] = _kmeans(sel, K, kmeans_iters, rng)
    return cents
