"""Train the packaged immobility (huddle) classifier.

The reference ships a pre-trained sklearn pipeline downloaded at runtime
(deepof/data.py:3079-3084) which is unavailable offline, so this repo
re-derives an equivalent estimator from the behavior's published
definition: immobility = sustained near-zero bodypart speeds, robust to
tracking jitter, in the exact feature space the annotation pipeline
produces (deepof/annotation_utils.py:739-870): 11 bodypart speed columns x
11 lead/lag window means, z-scored per recording.

Simulation: each synthetic recording is a 2-state semi-Markov process
(immobile / mobile) with geometric dwell times, per-recording immobility
base rates from 10-90% (the per-recording z-scoring makes the classifier
sensitive to base rate, so it must train across the whole range),
per-bodypart speed multipliers, slow-locomotion ambiguity, and occasional
jitter spikes during immobility.

Output: deepof_tpu/assets/immobility_classifier.npz — a single-hidden-layer
MLP (121 -> 32 -> 1) exported as raw weight arrays; the runtime wrapper
(deepof_tpu.annotate.PretrainedImmobilityClassifier) evaluates it in numpy.

Run: python scripts/train_immobility_classifier.py
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepof_tpu.annotate import IMMOBILITY_FEATURES_SPEEDS, augment_with_neighbors

SEED = 0
N_RECORDINGS = 60
T = 4000
FRAME_RATE = 25.0


def simulate_recording(rng: np.random.Generator):
    """(speeds (T, 11) mm/s, labels (T,)) for one synthetic session."""
    p_immobile = rng.uniform(0.1, 0.9)
    # Geometric dwell times, mean 2-12 s (immobility bouts are long).
    mean_dwell_imm = rng.uniform(2.0, 12.0) * FRAME_RATE
    mean_dwell_mob = mean_dwell_imm * (1 - p_immobile) / p_immobile

    state = rng.random() < p_immobile
    labels = np.empty(T, dtype=bool)
    i = 0
    while i < T:
        dwell = max(3, int(rng.geometric(
            1.0 / (mean_dwell_imm if state else mean_dwell_mob)
        )))
        labels[i : i + dwell] = state
        i += dwell
        state = not state

    # Per-bodypart speed multipliers: extremities move more than the spine.
    mult = {
        "Nose": 1.4, "Left_ear": 1.2, "Right_ear": 1.2, "Spine_1": 1.0,
        "Center": 0.9, "Spine_2": 0.9, "Tail_base": 0.8, "Left_fhip": 1.1,
        "Right_fhip": 1.1, "Left_bhip": 1.0, "Right_bhip": 1.0,
    }
    base_mobile = rng.uniform(25.0, 90.0)      # session activity level
    jitter_scale = rng.uniform(0.5, 4.0)       # tracking noise floor

    # Smooth mobile-speed envelope (bouts of walking/running), with some
    # slow-locomotion ambiguity near the immobility boundary.
    envelope = np.abs(np.convolve(
        rng.normal(size=T), np.ones(25) / 25.0, mode="same"
    )) * base_mobile + rng.uniform(3.0, 8.0)

    speeds = np.empty((T, len(IMMOBILITY_FEATURES_SPEEDS)), np.float32)
    for j, bp in enumerate(IMMOBILITY_FEATURES_SPEEDS):
        mobile_speed = envelope * mult[bp] * rng.gamma(4.0, 0.25, size=T)
        immobile_speed = np.abs(rng.normal(0, jitter_scale, size=T))
        # Jitter spikes: brief tracking glitches while the animal holds still.
        spikes = rng.random(T) < 0.01
        immobile_speed[spikes] += rng.gamma(2.0, 10.0, size=spikes.sum())
        speeds[:, j] = np.where(labels, immobile_speed, mobile_speed)
    return speeds, labels


def build_features(speeds: np.ndarray) -> np.ndarray:
    """Speeds (T, 11) -> (T, 121) anchored feature rows.

    Exactly what PretrainedImmobilityClassifier sees at inference: the
    pipeline's per-recording z-scores, shifted per column by their 1st
    percentile. The shift anchors "zero speed" at ~0 regardless of the
    recording's immobility base rate, which otherwise moves the z-score
    of resting frames and breaks cross-recording generalization.
    """
    from sklearn.preprocessing import StandardScaler

    df = pd.DataFrame(
        speeds, columns=[f"{bp}_speed" for bp in IMMOBILITY_FEATURES_SPEEDS]
    )
    aug = augment_with_neighbors(df)
    z = StandardScaler().fit_transform(np.nan_to_num(aug))
    return z - np.nanpercentile(z, 1, axis=0)


def main():
    from sklearn.metrics import accuracy_score
    from sklearn.neural_network import MLPClassifier

    rng = np.random.default_rng(SEED)
    xs, ys = [], []
    for _ in range(N_RECORDINGS):
        speeds, labels = simulate_recording(rng)
        feats = build_features(speeds)
        # Drop window edges (NaN-mean rows zero-filled by nan_to_num).
        xs.append(feats[10:-10])
        ys.append(labels[10:-10])
    x = np.concatenate(xs)
    y = np.concatenate(ys)

    n_train = int(0.8 * len(x))
    clf = MLPClassifier(
        hidden_layer_sizes=(32,), activation="relu", alpha=1e-4,
        max_iter=80, random_state=SEED,
    )
    clf.fit(x[:n_train], y[:n_train])
    acc = accuracy_score(y[n_train:], clf.predict(x[n_train:]))
    print(f"held-out accuracy: {acc:.4f} on {len(x) - n_train} frames")
    assert acc > 0.96, "classifier failed to learn the immobility definition"

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "deepof_tpu", "assets", "immobility_classifier.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        w0=clf.coefs_[0].astype(np.float32),
        b0=clf.intercepts_[0].astype(np.float32),
        w1=clf.coefs_[1].astype(np.float32),
        b1=clf.intercepts_[1].astype(np.float32),
        accuracy=np.float32(acc),
        seed=np.int32(SEED),
    )
    print(f"saved {out}")


if __name__ == "__main__":
    main()
