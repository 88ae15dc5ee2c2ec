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
  (:24-29) as default.

TPU mapping: quantization (find_leaf) is a batched 3-level
gather + (F, K, D) x (D,) dot-product argmax — one fused jit call for all
features of a frame.  The inverted file is sparse and mutation-heavy, so it
stays host-side (it is far off the hot path).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BRANCH_FACTOR = 40
LEVELS = 3
DESC_DIM = 72


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
def _descend(centroids, feats):
    """Batched greedy tree descent.

    centroids: (num_int, K, D) internal-node centroid blocks.
    feats: (F, D) normalized descriptors.
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
    return idx


class VocTree:
    def __init__(self, centroids: np.ndarray,
                 params: Optional[VocTreeParams] = None):
        """centroids: (num_int, K, D) float32."""
        K = BRANCH_FACTOR
        self.num_int = 1 + K + K * K
        self.num_leaf = K ** LEVELS
        assert centroids.shape == (self.num_int, K, DESC_DIM), \
            centroids.shape
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.params = params or VocTreeParams()

        # inverted file: leaf -> {doc_id: weight}
        self.leaf_docs: Dict[int, Dict[int, float]] = {}
        self.doc_size = 0
        # quarantine queue of (doc_id, feats)
        self._buffer: List[Tuple[int, np.ndarray]] = []
        # Gaussian transition table (voctree_bf.h:156-160)
        s = self.params.sigma
        d = np.arange(512)
        self.gausstab = (1.0 / math.sqrt(2 * math.pi * s * s)
                         * np.exp(-(d * d) / (2 * s * s)))
        self.lc_prob_old: Dict[int, float] = {}

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
        """(F, D) descriptors -> (F,) leaf indices (0-based leaf numbering)."""
        if len(feats) == 0:
            return np.zeros(0, np.int32)
        idx = np.asarray(_descend(self.centroids,
                                  jnp.asarray(feats, jnp.float32)))
        return idx - self.num_int  # leaf_idx (:101)

    # -- document insertion (with quarantine) ------------------------------

    def insert_doc(self, doc_id: int, feats: np.ndarray) -> Optional[int]:
        """Queue the document; once more than non_consider_recent documents
        are queued, the oldest is actually inserted.  Returns the doc id
        that entered the index this call (or None).  Passing doc_id=None
        flushes one queued document (reference doc_id == -2, :216)."""
        if doc_id is not None:
            self._buffer.append((doc_id, np.asarray(feats, np.float32)))

        flush = (len(self._buffer) > self.params.non_consider_recent
                 or (doc_id is None and self._buffer))
        if not flush:
            return None

        ins_id, ins_feats = self._buffer.pop(0)
        if len(ins_feats) == 0:
            return None
        w = 1.0 / len(ins_feats)
        for leaf in self.find_leaves(ins_feats):
            docs = self.leaf_docs.setdefault(int(leaf), {})
            docs[ins_id] = docs.get(ins_id, 0.0) + w
        self.doc_size += 1
        return ins_id

    # -- querying ----------------------------------------------------------

    def query(self, feats: np.ndarray):
        """Returns (scores {doc: score}, likelihood {doc: l}).

        Implements query_doc (voctree_bf.h:381-558): virtual average
        document refresh, tf-idf L1 scoring, mean fill-in for unmatched
        docs, and the mean+2*sigma likelihood transform.
        """
        p = self.params

        # refresh the virtual average document (doc -1)
        removed = False
        for docs in self.leaf_docs.values():
            if -1 in docs:
                del docs[-1]
                removed = True
        if removed:
            self.doc_size -= 1
        populated = [(len(d), leaf) for leaf, d in self.leaf_docs.items()
                     if len(d) > 0]
        if len(populated) > p.num_avg_words:
            populated.sort(reverse=True)
            w2 = 1.0 / p.num_avg_words
            for _, leaf in populated[:p.num_avg_words]:
                docs = self.leaf_docs[leaf]
                docs[-1] = docs.get(-1, 0.0) + w2
            self.doc_size += 1

        if len(feats) == 0 or self.doc_size == 0:
            return {}, {}

        leaves = self.find_leaves(feats)
        featcnt = len(feats)
        q: Dict[int, int] = {}
        for leaf in leaves:
            leaf = int(leaf)
            if self.leaf_docs.get(leaf):
                q[leaf] = q.get(leaf, 0) + 1

        score: Dict[int, float] = {}
        total = 0.0
        n_docs_hit = 1
        for leaf, cnt in q.items():
            docs = self.leaf_docs[leaf]
            idf = math.log10(self.doc_size / len(docs))
            n = (cnt / featcnt) * idf
            for did, m_raw in docs.items():
                m = m_raw * idf
                l1 = -(abs(n - m) - n - m)
                if did not in score:
                    score[did] = l1
                    n_docs_hit += 1
                else:
                    score[did] += l1
                total += l1

        mean_fill = total / n_docs_hit
        for did in range(-1, self.doc_size - 1):
            score.setdefault(did, mean_fill)

        vals = np.array(list(score.values()))
        mean = float(vals.mean())
        std = float(np.sqrt(max((vals ** 2).mean() - mean * mean, 0.0)))

        likelihood = {}
        for did, s in score.items():
            if s > mean + 2.0 * std and mean != 0.0:
                likelihood[did] = (s - 2.0 * std) / mean
            else:
                likelihood[did] = 1.0
        return score, likelihood

    # -- Bayesian temporal filter ------------------------------------------

    def _trans_prob(self, state: int, state_prev: int, n: int) -> float:
        """voctree_bf.h:560-587."""
        if state_prev == -1:
            return 0.9 if state == -1 else 0.1 / n
        if state == -1:
            return 0.1
        dist = abs(state_prev - state)
        return float(self.gausstab[dist]) if dist < 10 else 0.0

    def update_posterior(self, likelihood: Dict[int, float]) -> Dict[int, float]:
        """calc_post_prob (voctree_bf.h:589-706)."""
        n = self.doc_size
        lc_prob: Dict[int, float] = {}
        eta = 0.0
        for state, lhood in likelihood.items():
            belief = 0.0
            for j in range(-1, n):
                prev = self.lc_prob_old.get(j, 0.0)
                if prev:
                    belief += self._trans_prob(state, j, n) * prev
            post = lhood * belief
            lc_prob[state] = post
            eta += post
        if eta != 0.0:
            lc_prob = {k: v / eta for k, v in lc_prob.items()}
        elif lc_prob:
            u = 1.0 / len(lc_prob)
            lc_prob = {k: u for k in lc_prob}
        self.lc_prob_old = lc_prob
        return lc_prob

    def is_loop_closing(self, lc_prob: Dict[int, float]) -> Optional[int]:
        """isLoopClosing (voctree_bf.h:708-748): accept when a run of
        consecutive documents accumulates >= threshold posterior."""
        p = self.params
        if self.doc_size < p.non_consider_recent:
            return None
        items = sorted(lc_prob.items())
        seqlen = p.consider_seq_length
        for i in range(len(items) - seqlen):
            did, _ = items[i]
            if did == -1:
                continue
            if abs(items[i][0] - items[i + 1][0]) > 1:
                continue
            prob_sum = 0.0
            prob_max = -1.0
            max_id = None
            j = i
            for k in range(seqlen + 1):
                if j + 1 < len(items) and \
                        abs(items[j][0] - items[j + 1][0]) > 1 and \
                        k != seqlen:
                    continue
                prob_sum += items[j][1]
                if items[j][1] > prob_max:
                    prob_max = items[j][1]
                    max_id = items[j][0]
                j += 1
                if j >= len(items):
                    break
            if prob_sum >= p.threshold:
                return max_id
        return None

    def reset_filter(self):
        self.lc_prob_old = {}


# ---------------------------------------------------------------------------
# vocabulary training (the reference loads a prebuilt binary; we can build)
# ---------------------------------------------------------------------------

def _kmeans(feats: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Spherical k-means (dist = 1 - dot on normalized vectors)."""
    n = len(feats)
    if n == 0:
        c = rng.standard_normal((k, feats.shape[1] if feats.ndim == 2
                                 else DESC_DIM)).astype(np.float32)
        return c / np.linalg.norm(c, axis=1, keepdims=True)
    centers = feats[rng.choice(n, size=min(k, n), replace=False)].copy()
    if len(centers) < k:
        extra = rng.standard_normal((k - len(centers),
                                     feats.shape[1])).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        centers = np.concatenate([centers, extra])
    for _ in range(iters):
        assign = np.argmax(feats @ centers.T, axis=1)
        for j in range(k):
            sel = feats[assign == j]
            if len(sel):
                c = sel.mean(axis=0)
                nc = np.linalg.norm(c)
                if nc > 0:
                    centers[j] = c / nc
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
