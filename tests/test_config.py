"""Config/deck parser tests (schema mirrors reference InputDataPoroel.h)."""

import math

import pytest

from poroelasticity_dealii_tpu.config import (
    MILLIDARCY, InputData, format_deck, from_entries, parse_deck,
    read_input_file)

GOLDEN = "configs/golden_2d.data"


def test_defaults_match_reference_declarations():
    data = from_entries({})
    # declare_parameters defaults, InputDataPoroel.h:89-147
    assert data.dim == 2
    assert data.domain_size == (10.0, 10.0)
    assert data.initial_refinement_level == 3
    assert data.max_refinement_level == 5
    assert data.youngs_modulus == 7e9
    assert data.poisson_ratio == 0.3
    assert data.biot_coef == 0.9
    assert data.perm == 1.0 * MILLIDARCY
    assert data.poro == 0.3
    assert data.visc == 1e-3
    assert data.bulk_density == 2700
    assert data.f_comp == 45.8e-11
    assert data.r_well == 0.1
    assert data.flow_rate == 1e-6
    assert data.p_init == 10e6
    assert data.displacement_boundary_labels == (0, 2, 3, 1)
    assert data.displacement_boundary_components == (1, 1, 0, 0)
    assert data.displacement_boundary_values == (0.0, 0.0, 0.0, -0.1)
    assert data.time_step == 60 and data.t_max == 60
    assert data.max_fss_iterations == 50
    assert data.max_pressure_iterations == 50
    assert data.fss_tol == 1e-8 and data.pressure_tol == 1e-8


def test_golden_deck_parses():
    data = read_input_file(GOLDEN)
    assert data.dim == 2
    assert data.initial_refinement_level == 4
    assert data.youngs_modulus == 1.4e10
    assert data.perm == pytest.approx(10 * MILLIDARCY)
    assert data.flow_rate == 1e-5
    assert data.r_well == 1.0
    assert data.t_max == 1e3
    assert data.stress_boundary_labels == ()
    assert data.displacement_boundary_values == (0.0, -1e-5, 0.0, -1e-5)


def test_derived_moduli_formulas():
    # compute_derived_parameters, InputDataPoroel.h:213-222
    data = read_input_file(GOLDEN)
    E, nu, b, phi, cf = 1.4e10, 0.3, 0.9, 0.3, 5.8e-10
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    G = 0.5 * E / (1 + nu)
    K = lam + 2.0 / 3.0 * G
    Ks = K / (1 - b)
    N = Ks / (b - phi)
    M = (N / cf) / (N * phi + 1 / cf)
    assert data.lame_constant == pytest.approx(lam)
    assert data.shear_modulus == pytest.approx(G)
    assert data.bulk_modulus == pytest.approx(K)
    assert data.grain_bulk_modulus == pytest.approx(Ks)
    assert data.n_modulus == pytest.approx(N)
    assert data.m_modulus == pytest.approx(M)


def test_bounds_enforced():
    with pytest.raises(ValueError):
        from_entries({("Properties", "Poisson ratio"): "0.7"})
    with pytest.raises(ValueError):
        from_entries({("Properties", "Biot coefficient"): "0.05"})
    with pytest.raises(KeyError):
        from_entries({("Properties", "Not A Key"): "1"})


def test_mismatched_bc_lists_rejected():
    # the reference constructs-but-never-throws this check
    # (BoundaryConditions.h:34-35); we enforce it
    with pytest.raises(ValueError):
        from_entries({("In situ", "Displacement boundary labels"): "0, 1"})


def test_deck_roundtrip():
    data = read_input_file(GOLDEN)
    data2 = from_entries(parse_deck(format_deck(data)))
    for f in ("dim", "perm", "m_modulus", "time_step", "t_max",
              "displacement_boundary_values", "p_init"):
        a, b = getattr(data, f), getattr(data2, f)
        if isinstance(a, float):
            assert math.isclose(a, b, rel_tol=1e-12)
        else:
            assert a == b


def test_comment_and_empty_list_handling():
    entries = parse_deck("""
# full line comment
subsection In situ
  set Stress boundary labels = # nothing
end
""")
    assert entries[("In situ", "Stress boundary labels")] == ""


def test_roundtrip_covers_new_sections():
    data = from_entries({
        ("In situ", "Pressure boundary labels"): "3",
        ("In situ", "Pressure boundary values"): "0",
        ("TPU", "Volumetric strain resync"): "true",
        ("TPU", "Gravity direction"): "1",
    })
    data2 = from_entries(parse_deck(format_deck(data)))
    assert data2.pressure_boundary_labels == (3,)
    assert data2.resync_volumetric_strain is True
    assert data2.gravity_direction == 1
