import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi

from tissue_image_processing_tpu.ops.components import (
    connected_components, relabel_sequential)
from tissue_image_processing_tpu.ops.regionprops import regionprops
from tissue_image_processing_tpu.ops.neighbors import (
    adjacency_matrix, neighbor_lists, contact_length_matrix, second_order_adjacency)
from oracles import perimeter_oracle, reference_find_neighbors, reference_contact_matrix


def random_mask(rng, h=64, w=64, p=0.55):
    return rng.random((h, w)) < p


def test_connected_components_matches_scipy(rng):
    mask = random_mask(rng)
    got = np.asarray(connected_components(mask, connectivity=1))
    want, _ = ndi.label(mask, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    np.testing.assert_array_equal(got, want)


def test_connected_components_8conn(rng):
    mask = random_mask(rng, p=0.4)
    got = np.asarray(connected_components(mask, connectivity=2))
    want, _ = ndi.label(mask, structure=np.ones((3, 3)))
    np.testing.assert_array_equal(got, want)


def test_connected_components_spiral():
    # long snaking component exercises pointer jumping depth
    m = np.zeros((32, 32), bool)
    m[0, :] = True
    m[:, -1] = True
    m[-1, :] = True
    m[2:, 0] = True
    got = np.asarray(connected_components(m, connectivity=1))
    assert got.max() == 1
    np.testing.assert_array_equal(got > 0, m)


def test_relabel_sequential():
    lab = np.array([[0, 5, 5], [9, 0, 5], [9, 9, 2]])
    got = np.asarray(relabel_sequential(jnp.asarray(lab)))
    want = np.array([[0, 2, 2], [3, 0, 2], [3, 3, 1]])
    np.testing.assert_array_equal(got, want)


def _toy_labels():
    lab = np.zeros((32, 32), np.int32)
    lab[2:13, 2:16] = 1
    lab[2:13, 17:30] = 2
    lab[14:28, 2:16] = 3
    lab[14:28, 17:30] = 4
    lab[13, :] = 0
    lab[:, 16] = 0
    return lab


def test_regionprops_basic(rng):
    lab = _toy_labels()
    props = regionprops(jnp.asarray(lab), num_labels=8)
    for l in range(1, 5):
        m = lab == l
        ys, xs = np.nonzero(m)
        assert float(props["area"][l]) == m.sum()
        np.testing.assert_allclose(float(props["cy"][l]), ys.mean(), atol=1e-4)
        np.testing.assert_allclose(float(props["cx"][l]), xs.mean(), atol=1e-4)
        assert int(props["bbox_min_row"][l]) == ys.min()
        assert int(props["bbox_max_row"][l]) == ys.max() + 1
        assert int(props["bbox_min_col"][l]) == xs.min()
        assert int(props["bbox_max_col"][l]) == xs.max() + 1
        np.testing.assert_allclose(float(props["perimeter"][l]), perimeter_oracle(m), atol=1e-3)
    assert not bool(props["exists"][5])


def test_regionprops_perimeter_irregular(rng):
    # irregular blobby region
    mask = ndi.binary_closing(rng.random((40, 40)) < 0.4, np.ones((3, 3)))
    lab, _ = ndi.label(mask)
    n = lab.max()
    props = regionprops(jnp.asarray(lab.astype(np.int32)), num_labels=int(n) + 1)
    for l in range(1, n + 1):
        np.testing.assert_allclose(float(props["perimeter"][l]),
                                   perimeter_oracle(lab == l), atol=1e-3)


def test_regionprops_intensity(rng):
    lab = _toy_labels()
    img = rng.random(lab.shape).astype(np.float32)
    props = regionprops(jnp.asarray(lab), num_labels=8, intensity=jnp.asarray(img))
    for l in range(1, 5):
        np.testing.assert_allclose(float(props["mean_intensity"][l]),
                                   img[lab == l].mean(), atol=1e-5)


def test_adjacency_matches_reference():
    lab = _toy_labels()
    adj = np.asarray(adjacency_matrix(jnp.asarray(lab), num_labels=8))
    got_pairs = {frozenset((a, b)) for a in range(9) for b in range(a + 1, 9) if adj[a, b]}
    want_pairs = reference_find_neighbors(lab)
    assert got_pairs == want_pairs


def test_adjacency_working_mask():
    lab = _toy_labels()
    # only cell 4 in the working set: reference inserts only pairs whose window max
    # (larger label) is 4
    mask = np.zeros(9, bool)
    mask[4] = True
    adj = np.asarray(adjacency_matrix(jnp.asarray(lab), num_labels=8,
                                      working_mask=jnp.asarray(mask)))
    got_pairs = {frozenset((a, b)) for a in range(9) for b in range(a + 1, 9) if adj[a, b]}
    want_pairs = reference_find_neighbors(lab, working_labels=[4])
    assert got_pairs == want_pairs


def test_adjacency_compact_parity():
    # run-dedup + top_k compaction is exact when rows carry <= k vote runs
    from conftest import make_cell_labels
    from tissue_image_processing_tpu.ops.neighbors import adjacency_overflow
    lab = make_cell_labels(96, 128, n_seeds=40, seed=5)
    cap = int(lab.max()) + 4
    exact = np.asarray(adjacency_matrix(jnp.asarray(lab), num_labels=cap))
    compact = np.asarray(adjacency_matrix(jnp.asarray(lab), num_labels=cap,
                                          compact_k=64))
    np.testing.assert_array_equal(exact, compact)
    assert not bool(adjacency_overflow(jnp.asarray(lab), cap, k=64))
    # with a working mask too
    mask = np.zeros(cap + 1, bool)
    mask[1::2] = True
    em = np.asarray(adjacency_matrix(jnp.asarray(lab), num_labels=cap,
                                     working_mask=jnp.asarray(mask)))
    cm = np.asarray(adjacency_matrix(jnp.asarray(lab), num_labels=cap,
                                     working_mask=jnp.asarray(mask), compact_k=64))
    np.testing.assert_array_equal(em, cm)


def test_adjacency_overflow_flags_adversarial():
    # alternating 1-px labels: every pixel is a vote-run start -> any small k
    # overflows, and the flag says so (callers then take the exact path)
    from tissue_image_processing_tpu.ops.neighbors import adjacency_overflow
    lab = np.tile(np.arange(1, 33, dtype=np.int32), (8, 1))
    assert bool(adjacency_overflow(jnp.asarray(lab), 32, k=4))
    # with sufficient k the compact path is still exact even here
    exact = np.asarray(adjacency_matrix(jnp.asarray(lab), num_labels=32))
    compact = np.asarray(adjacency_matrix(jnp.asarray(lab), num_labels=32,
                                          compact_k=lab.shape[1]))
    np.testing.assert_array_equal(exact, compact)


def test_contact_matrix_compact_parity():
    # RLE (run-start keys + run lengths) preserves per-pair pixel COUNTS
    from conftest import make_cell_labels
    from tissue_image_processing_tpu.ops.neighbors import (
        contact_length_matrix_checked)
    lab = make_cell_labels(96, 128, n_seeds=40, seed=11)
    cap = int(lab.max()) + 2
    exact = np.asarray(contact_length_matrix(jnp.asarray(lab), num_labels=cap))
    compact, ovf = contact_length_matrix_checked(jnp.asarray(lab),
                                                 num_labels=cap, compact_k=64)
    np.testing.assert_array_equal(exact, np.asarray(compact))
    assert not bool(ovf)
    # toy map parity (includes the boundary/sentinel edge cases)
    lab2 = _toy_labels()
    e2 = np.asarray(contact_length_matrix(jnp.asarray(lab2), num_labels=4))
    c2 = np.asarray(contact_length_matrix(jnp.asarray(lab2), num_labels=4,
                                          compact_k=16))
    np.testing.assert_array_equal(e2, c2)


def test_contact_matrix_compact_overflow_flag():
    from tissue_image_processing_tpu.ops.neighbors import (
        contact_length_matrix_checked)
    lab = np.tile(np.arange(1, 33, dtype=np.int32), (8, 1))
    mat, ovf = contact_length_matrix_checked(jnp.asarray(lab), num_labels=32,
                                             compact_k=4)
    assert bool(ovf)
    # sufficient k is exact even on the adversarial map
    exact = np.asarray(contact_length_matrix(jnp.asarray(lab), num_labels=32))
    c, ovf2 = contact_length_matrix_checked(jnp.asarray(lab), num_labels=32,
                                            compact_k=lab.shape[1])
    assert not bool(ovf2)
    np.testing.assert_array_equal(exact, np.asarray(c))


def test_frame_cellinfo_compact_neighbors_parity():
    from conftest import make_cell_labels
    from tissue_image_processing_tpu.core.cell_table import frame_cellinfo
    lab = make_cell_labels(96, 128, n_seeds=40, seed=7)
    cap = 64
    exact = frame_cellinfo(jnp.asarray(lab), capacity=cap)
    compact = frame_cellinfo(jnp.asarray(lab), capacity=cap,
                             neighbor_compact_k=64)
    np.testing.assert_array_equal(np.asarray(exact.neighbors),
                                  np.asarray(compact.neighbors))
    np.testing.assert_array_equal(np.asarray(exact.n_neighbors),
                                  np.asarray(compact.n_neighbors))


def test_neighbor_lists():
    lab = _toy_labels()
    adj = adjacency_matrix(jnp.asarray(lab), num_labels=8)
    nbrs, counts = neighbor_lists(adj, max_neighbors=8)
    nbrs = np.asarray(nbrs)
    counts = np.asarray(counts)
    adjn = np.asarray(adj)
    for l in range(1, 5):
        want = set(np.nonzero(adjn[l])[0].tolist())
        got = set(nbrs[l][:counts[l]].tolist())
        assert got == want


def test_contact_matrix_matches_reference():
    lab = _toy_labels()
    got = np.asarray(contact_length_matrix(jnp.asarray(lab), num_labels=4))
    want = reference_contact_matrix(lab)
    np.testing.assert_allclose(got, want)


def test_second_order_adjacency():
    lab = _toy_labels()
    adj = adjacency_matrix(jnp.asarray(lab), num_labels=4)
    valid = jnp.ones((5,), bool)
    adj2 = np.asarray(second_order_adjacency(adj, valid, valid))
    a = np.asarray(adj).astype(int)
    want = (a @ a > 0)
    want &= ~np.eye(5, dtype=bool)
    want[:, 0] = want[0, :] = False
    np.testing.assert_array_equal(adj2, want)


def test_regionprops_overflow_detection():
    """Labels beyond capacity are dropped to background and reported, never
    pooled into the top slot (SURVEY §7 ragged-data hard part)."""
    lab = _toy_labels()  # labels 1..4
    props = regionprops(jnp.asarray(lab), num_labels=3)
    assert int(props["overflow"]) == 1
    # slot 3 holds label 3's own stats, uncorrupted by label 4's pixels
    m3 = lab == 3
    assert float(props["area"][3]) == m3.sum()
    ys, xs = np.nonzero(m3)
    np.testing.assert_allclose(float(props["cy"][3]), ys.mean(), atol=1e-4)
    # no overflow at sufficient capacity
    props8 = regionprops(jnp.asarray(lab), num_labels=8)
    assert int(props8["overflow"]) == 0
