"""Keyframe recognition database: BoW scoring over all keyframes.

TPU-native replacement for ``KeyFrameDatabase``
(jni/ORB_SLAM2/src/KeyFrameDatabase.cc): the reference keeps an inverted
file (word -> list of keyframes) and walks it per query. With a 10k-word
vocabulary and dense per-keyframe BoW rows, the whole candidate search is a
couple of masked reductions over a (max_kf, n_words) matrix — the "on-device
inverted-index scoring" of the north star (BASELINE.json).

Candidate logic mirrors DetectRelocalizationCandidates / DetectLoopCandidates
(KeyFrameDatabase.cc:84-328): shared-word count gate at 0.8x the max, L1
similarity scoring, covisibility-accumulated scores, keep > 0.75x best.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from .vocabulary import Vocabulary, bow_vector, l1_score, transform


@flax.struct.dataclass
class KeyframeDatabase:
    bow: jnp.ndarray       # (K, W) f32 — L1-normalized tf-idf row per keyframe
    has_entry: jnp.ndarray  # (K,) bool

    @classmethod
    def create(cls, max_kf: int, n_words: int) -> "KeyframeDatabase":
        return cls(
            bow=jnp.zeros((max_kf, n_words), jnp.float32),
            has_entry=jnp.zeros(max_kf, bool),
        )


@jax.jit
def add_keyframe_bow(
    db: KeyframeDatabase, kf_id: jnp.ndarray, v: jnp.ndarray
) -> KeyframeDatabase:
    """Register a keyframe's BoW vector (KeyFrameDatabase::add)."""
    return db.replace(
        bow=db.bow.at[kf_id].set(v),
        has_entry=db.has_entry.at[kf_id].set(True),
    )


@jax.jit
def erase_keyframe_bow(db: KeyframeDatabase, kf_id: jnp.ndarray) -> KeyframeDatabase:
    return db.replace(
        bow=db.bow.at[kf_id].set(0.0),
        has_entry=db.has_entry.at[kf_id].set(False),
    )


@jax.jit
def _mask_db_valid(db: KeyframeDatabase, kf_valid: jnp.ndarray) -> KeyframeDatabase:
    """Zero the rows of keyframes no longer valid in the map."""
    keep = db.has_entry & kf_valid
    return db.replace(
        bow=jnp.where(keep[:, None], db.bow, 0.0), has_entry=keep
    )


@jax.jit
def build_db_from_keyframes(
    vocab: Vocabulary,
    kf_desc: jnp.ndarray,        # (K, N, 8)
    kf_feat_valid: jnp.ndarray,  # (K, N)
    kf_valid: jnp.ndarray,       # (K,)
) -> KeyframeDatabase:
    """Re-index every valid keyframe in one batched pass (used after the
    vocabulary is (re)trained — the reference parses a fixed ORBvoc.txt once
    and never retrains, but its 1M-word tree was trained offline on a large
    corpus; retraining as the map grows is our substitute for that corpus)."""
    K, N, _ = kf_desc.shape
    words, _ = transform(vocab, kf_desc.reshape(K * N, 8), kf_feat_valid.reshape(K * N))
    rows = jax.vmap(lambda w: bow_vector(vocab, w))(words.reshape(K, N))
    rows = jnp.where(kf_valid[:, None], rows, 0.0)
    return KeyframeDatabase(bow=rows, has_entry=kf_valid)


def _common_words(db: KeyframeDatabase, v: jnp.ndarray) -> jnp.ndarray:
    """(K,) number of vocabulary words shared with the query."""
    return jnp.sum((db.bow > 0) & (v[None, :] > 0), axis=1).astype(jnp.int32)


@jax.jit
def query_candidates(
    db: KeyframeDatabase,
    v: jnp.ndarray,
    exclude: jnp.ndarray,
    covis_weights: jnp.ndarray,
    min_score: jnp.ndarray = jnp.asarray(0.0),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared-word + accumulated-score candidate selection.

    Args:
      v: (W,) query BoW vector.
      exclude: (K,) bool — keyframes that may not be candidates (the query's
        covisibility group for loops — KeyFrameDatabase.cc:95; empty for
        relocalization).
      covis_weights: (K, K) covisibility matrix for score accumulation over
        each candidate's top neighbors (KeyFrameDatabase.cc:152-185).
      min_score: similarity floor (loop detection passes the min covis score,
        DetectLoopCandidates; reloc passes 0).

    Returns (acc_scores (K,), candidate_mask (K,)): keyframes passing all
    gates with their covisibility-accumulated scores.
    """
    eligible = db.has_entry & ~exclude
    common = jnp.where(eligible, _common_words(db, v), 0)
    max_common = jnp.max(common)
    min_common = (0.8 * max_common).astype(jnp.int32)  # KeyFrameDatabase.cc:129

    scores = l1_score(db.bow, v)
    pass1 = eligible & (common > min_common) & (scores >= min_score)

    # accumulate scores over each keyframe's top-10 covisible neighbors that
    # also passed (KeyFrameDatabase.cc:152-185)
    nb_w = jnp.where(pass1[None, :], covis_weights, 0)
    top_w, top_i = jax.lax.top_k(nb_w, min(10, nb_w.shape[1]))  # (K, <=10)
    nb_scores = jnp.where(top_w > 0, scores[top_i], 0.0)
    acc = jnp.where(pass1, scores, 0.0) + jnp.sum(nb_scores, axis=1)

    best_acc = jnp.max(jnp.where(pass1, acc, 0.0))
    keep = pass1 & (acc > 0.75 * best_acc)  # KeyFrameDatabase.cc:185
    return acc, keep


class BowIndex:
    """Host-side owner of the vocabulary + database, updated per keyframe.

    The analogue of the (vocabulary, KeyFrameDatabase) pair owned by System
    (src/System.cc:124-139). The vocabulary is trained lazily from the first
    keyframes' descriptors (no ORBvoc.txt exists in this environment).
    """

    def __init__(self, max_kf: int, branching: int = 10, depth: int = 4):
        self.branching = branching
        self.depth = depth
        self.max_kf = max_kf
        self.vocab: Vocabulary | None = None
        self.db: KeyframeDatabase | None = None
        self._pending: list = []  # keyframes waiting for vocab training

    @property
    def ready(self) -> bool:
        return self.vocab is not None

    def maybe_train(self, desc: jnp.ndarray, valid: jnp.ndarray, key) -> None:
        """Train the vocabulary from the supplied corpus if not yet trained."""
        from .vocabulary import train_vocabulary

        if self.vocab is None:
            self.vocab = train_vocabulary(
                desc, valid, key, branching=self.branching, depth=self.depth
            )
            self.db = KeyframeDatabase.create(
                self.max_kf, self.branching**self.depth
            )
            for kf_id, d, dv in self._pending:
                self.add(kf_id, d, dv)
            self._pending = []

    def retrain(
        self,
        kf_desc: jnp.ndarray,
        kf_feat_valid: jnp.ndarray,
        kf_valid: jnp.ndarray,
        key,
    ) -> None:
        """Re-train the vocabulary on the full accumulated keyframe corpus
        and re-index every valid keyframe (vocabulary lifecycle: the initial
        ~4-keyframe vocabulary leaves most words empty and its idf frozen —
        place recognition sharpens considerably with a larger corpus)."""
        from .vocabulary import train_vocabulary

        K, N, _ = kf_desc.shape
        self.vocab = train_vocabulary(
            kf_desc.reshape(K * N, 8),
            kf_feat_valid.reshape(K * N) & jnp.repeat(kf_valid, N),
            key, branching=self.branching, depth=self.depth,
        )
        self.db = build_db_from_keyframes(
            self.vocab, kf_desc, kf_feat_valid, kf_valid
        )

    def add(self, kf_id: int, desc: jnp.ndarray, valid: jnp.ndarray) -> None:
        if self.vocab is None:
            self._pending.append((kf_id, desc, valid))
            return
        words, _ = transform(self.vocab, desc, valid)
        v = bow_vector(self.vocab, words)
        self.db = add_keyframe_bow(self.db, jnp.asarray(kf_id), v)

    def erase(self, kf_id: int) -> None:
        if self.db is not None:
            self.db = erase_keyframe_bow(self.db, jnp.asarray(kf_id))

    def mask_valid(self, kf_valid: jnp.ndarray) -> None:
        """Batch erase of every culled keyframe's row
        (KeyFrameDatabase::erase, src/KeyFrameDatabase.cc:60-75): the culls
        happen on device inside the mapping pass, so the host learns about
        them lazily — callers invoke this with the map's kf_valid before
        querying (one fused dispatch, no sync)."""
        if self.db is not None:
            self.db = _mask_db_valid(self.db, kf_valid)

    def permute(self, kf_map: jnp.ndarray) -> None:
        """Renumber database rows after map compaction: row old -> kf_map[old]
        (-1 rows dropped)."""
        if self.db is None:
            return
        K = self.db.bow.shape[0]
        tgt = jnp.where(kf_map >= 0, kf_map, K)
        bow = jnp.zeros_like(self.db.bow).at[tgt].set(self.db.bow, mode="drop")
        has = jnp.zeros_like(self.db.has_entry).at[tgt].set(
            self.db.has_entry, mode="drop"
        )
        self.db = self.db.replace(bow=bow, has_entry=has)

    def query_vector(self, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        words, _ = transform(self.vocab, desc, valid)
        return bow_vector(self.vocab, words)
