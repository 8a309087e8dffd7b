import jax
import jax.numpy as jnp
import numpy as np

from vector_db_tpu.ops.kmeans import kmeans, kmeans_multi


def make_blobs(rng, k=4, per=50, dim=8, spread=0.05):
    centers = rng.standard_normal((k, dim)).astype(np.float32) * 5
    pts = np.concatenate(
        [c + spread * rng.standard_normal((per, dim)).astype(np.float32) for c in centers]
    )
    return centers, pts


def test_kmeans_recovers_blobs(rng):
    centers, pts = make_blobs(rng)
    c, labels = kmeans(jnp.asarray(pts), 4, jax.random.key(0), iters=25, restarts=8)
    c, labels = np.asarray(c), np.asarray(labels)
    # Every true center should be close to some learned centroid.
    d = np.linalg.norm(centers[:, None, :] - c[None, :, :], axis=-1)
    assert np.all(d.min(axis=1) < 0.5)
    # Points in the same blob share a label.
    for b in range(4):
        blob = labels[b * 50 : (b + 1) * 50]
        assert len(set(blob.tolist())) == 1


def test_kmeans_labels_are_nearest_centroid(rng):
    pts = rng.standard_normal((100, 6)).astype(np.float32)
    c, labels = kmeans(jnp.asarray(pts), 5, jax.random.key(1), iters=10)
    c, labels = np.asarray(c), np.asarray(labels)
    d = np.linalg.norm(pts[:, None, :] - c[None, :, :], axis=-1)
    np.testing.assert_array_equal(labels, d.argmin(axis=1))


def test_kmeans_multi_vmaps_over_subspaces(rng):
    x = rng.standard_normal((3, 80, 4)).astype(np.float32)
    c, labels = kmeans_multi(jnp.asarray(x), 4, jax.random.key(2), iters=10)
    assert c.shape == (3, 4, 4)
    assert labels.shape == (3, 80)
    assert np.asarray(labels).max() < 4
