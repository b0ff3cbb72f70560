"""tools/convert_anny.py probe machinery, end-to-end on a synthetic source.

The real ``anny`` package is licensed and absent here; the converter is
black-box (it only uses forward() + label lists), so its entire pipeline —
lattice probing, affine blendshape/joint fits, hierarchy probing, skinning
least squares, validation — can be exercised against a synthetic Anny model
wrapped as a fake package. If the probes reconstruct THIS model family
exactly, they reconstruct the real package wherever it is the same math
(MakeHuman lattice-interp + LBS, no pose correctives).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from multihmr_tpu.bodymodel.anny import (
    AnnyModel,
    anny_forward,
    load_anny_npz,
    save_anny_npz,
    synthetic_anny_model,
    USED_PHENOTYPES,
)
from tools.convert_anny import convert, _phen_dict, _identity_poses, _random_rotmats


def _make_source(num_vertices=48, num_bones=18, n_blend=6, seed=3):
    """Synthetic AnnyModel wrapped as a duck-typed 'anny package'."""
    m = synthetic_anny_model(
        num_vertices=num_vertices, num_bones=num_bones, n_blend=n_blend,
        num_knots=3, seed=seed,
    )
    # the real package has no pose-corrective blendshapes
    base = dataclasses.replace(m.base, posedirs=jnp.zeros_like(m.base.posedirs))
    m = dataclasses.replace(m, base=base)

    nb = num_bones

    class Source:
        bone_labels = list(m.bone_labels)
        phenotype_labels = list(m.phenotype_labels)
        num_bones = nb
        faces = np.asarray(m.base.faces)
        model = m

        def forward(self, pose, phen):
            out = anny_forward(
                m, jnp.asarray(np.asarray(pose, np.float32)),
                {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in phen.items()},
            )
            return {k: np.asarray(v) for k, v in out.items()}

    return Source(), m


def test_convert_roundtrip(tmp_path):
    source, truth = _make_source()
    knots = np.linspace(0.0, 1.0, 3)  # supersets the synthetic model's knots
    model = convert(source, knots, n_poses=40, validate_n=6, tol=2e-4)

    # independent check on fresh random inputs
    rng = np.random.default_rng(7)
    B, J = 5, source.num_bones
    poses = _identity_poses(B, J)
    poses[:, :, :3, :3] = _random_rotmats(rng, (B, J), scale=0.5)
    phen = rng.uniform(0, 1, size=(B, 6)).astype(np.float32)
    want = source.forward(poses, _phen_dict(phen))
    got = anny_forward(
        model, jnp.asarray(poses),
        {k: jnp.asarray(v) for k, v in _phen_dict(phen).items()},
    )
    np.testing.assert_allclose(
        np.asarray(got["vertices"]), want["vertices"], atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["bone_poses"]), want["bone_poses"], atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["blendshape_coeffs"]), want["blendshape_coeffs"], atol=1e-5
    )
    # probed hierarchy must equal the true one
    np.testing.assert_array_equal(
        np.asarray(model.base.parents), np.asarray(truth.base.parents)
    )
    assert model.bone_labels == truth.bone_labels

    # container save/load roundtrip
    p = str(tmp_path / "anny.npz")
    save_anny_npz(p, model)
    loaded = load_anny_npz(p)
    assert isinstance(loaded, AnnyModel)
    assert loaded.bone_labels == model.bone_labels
    assert loaded.phenotype_labels == model.phenotype_labels
    got2 = anny_forward(
        loaded, jnp.asarray(poses),
        {k: jnp.asarray(v) for k, v in _phen_dict(phen).items()},
    )
    np.testing.assert_allclose(
        np.asarray(got2["vertices"]), np.asarray(got["vertices"]), atol=1e-6
    )


def test_person_center_and_phenotype_resolution():
    """person_center resolves from bone labels (reference multi_hmr.py:72)
    and phenotype indices from the asset's label order (reference :170-172),
    not from hardcoded positions."""
    m = synthetic_anny_model(num_vertices=32, num_bones=20, n_blend=4)
    assert m.person_center_index("head") == 15
    assert m.bone_labels[15] == "head"
    # scrambled phenotype label order must re-map the used indices
    scrambled = ("race", "gender", "age", "cup_size", "weight", "height",
                 "muscle", "proportions", "firmness", "asymmetry")
    m2 = dataclasses.replace(m, phenotype_labels=scrambled)
    assert m2.used_phenotype_indices() == [2, 1, 4, 5, 6, 7]
    assert [scrambled[i] for i in m2.used_phenotype_indices()] == list(USED_PHENOTYPES)


def test_lattice_interpolation_matches_corners():
    """phenotype_to_coeffs at knot points returns the lattice rows exactly,
    and interpolates multilinearly between them."""
    from multihmr_tpu.bodymodel.anny import phenotype_to_coeffs

    m = synthetic_anny_model(num_vertices=16, num_bones=8, n_blend=3, num_knots=3)
    nk = m.num_knots
    # corner: all phenotypes at knot 1 (=0.5)
    phen = {n: jnp.full((2,), 0.5) for n in USED_PHENOTYPES}
    got = np.asarray(phenotype_to_coeffs(m, phen))
    idx = sum(1 * nk ** (5 - d) for d in range(6))
    np.testing.assert_allclose(got[0], np.asarray(m.pheno_lattice)[idx], atol=1e-6)
    # midpoint between two corners along one dim
    phen["age"] = jnp.full((2,), 0.25)
    got = np.asarray(phenotype_to_coeffs(m, phen))
    lo = sum((1 if d else 0) * nk ** (5 - d) for d in range(6))
    hi = lo + 1 * nk ** 5
    want = 0.5 * (np.asarray(m.pheno_lattice)[lo] + np.asarray(m.pheno_lattice)[hi])
    np.testing.assert_allclose(got[0], want, atol=1e-6)
