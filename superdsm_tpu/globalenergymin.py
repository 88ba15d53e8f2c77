"""Stage 4: global energy minimization (Algorithm 1 + Criterion 2).

Counterpart of the reference's ``GlobalEnergyMinimization``
(``/root/reference/superdsm/globalenergymin.py:97-368``): singleton atoms and
per-cluster universes are solved first; clusters satisfying Criterion 2
(universe energy <= beta + sum of atom energies) are solved in closed form;
the remaining clusters grow candidate footprints generation by generation,
pruned either exactly (MSC upper bound minus remaining-singleton lower bound,
with a maxsetpack bound) or greedily (ISBI 2024). The combinatorics run on
the host; every generation's surviving candidates are solved in one padded
device batch via :func:`superdsm_tpu.objects.compute_objects` — the hottest
fan-out of the whole pipeline, which the reference distributes over Ray
workers one object at a time.
"""

import numpy as np

from .pipeline import Stage
from ._aux import join_path, mkdir, copy_dict
from .output import get_output, Text
from .objects import compute_objects, Object
from .minsetcover import MinSetCover, DEFAULT_MAX_ITER, DEFAULT_GAMMA
from .maxsetpack import solve_maxsetpack
from .image import Image
from ._stability import dq


DEFAULT_MAX_WORK_AMOUNT = 10 ** 6


def _get_generation_log_dir(log_root_dir, generation_number):
    if log_root_dir is None:
        return None
    gen_dir = join_path(log_root_dir, f'gen{generation_number}')
    mkdir(gen_dir)
    return gen_dir


def _ratio(numerator, denominator):
    """numerator/denominator, NaN on an empty denominator."""
    return numerator / denominator if denominator else np.nan


class PerformanceReport:
    """Pruning-performance telemetry, aggregated per image and per task into
    ``performance.csv`` (counter names and column order are the on-disk
    contract; cf. ``/root/reference/superdsm/globalenergymin.py:23-94``).

    Counters: ``direct_solution_trial_count`` (Criterion 2 evaluated) /
    ``direct_solution_success_count`` (it yielded a closed-form solution);
    ``iterative_[computed_]object_count`` (bruteforce vs Algorithm 1);
    ``overall_[computed_]object_count`` (without vs with Alg. 1 + Crit. 2);
    ``nontrivial_[computed_]object_count`` (excluding clusters of <= 2
    atoms). Derived success/pruning rates are properties.
    """

    attributes = [
        'direct_solution_trial_count',
        'direct_solution_success_count',
        'iterative_object_count',
        'iterative_computed_object_count',
        'overall_object_count',
        'overall_computed_object_count',
        'nontrivial_object_count',
        'nontrivial_computed_object_count',
    ]

    def __init__(self, **counts):
        unknown = set(counts) - set(self.attributes)
        assert not unknown, unknown
        self.__dict__.update({key: counts.get(key, 0)
                              for key in self.attributes})

    @property
    def direct_solution_success(self):
        return _ratio(self.direct_solution_success_count,
                      self.direct_solution_trial_count)

    @property
    def iterative_pruning_success(self):
        return 1 - _ratio(self.iterative_computed_object_count,
                          self.iterative_object_count)

    @property
    def overall_pruning_success(self):
        return 1 - _ratio(self.overall_computed_object_count,
                          self.overall_object_count)

    @property
    def nontrivial_pruning_success(self):
        """Pruned fraction within non-trivial clusters — the key indicator."""
        return 1 - _ratio(self.nontrivial_computed_object_count,
                          self.nontrivial_object_count)

    def __iadd__(self, other):
        for key in self.attributes:
            self.__dict__[key] += getattr(other, key)
        return self

    def _assert_integrity(self):
        for value in (self.direct_solution_success, self.iterative_pruning_success,
                      self.nontrivial_pruning_success, self.overall_pruning_success):
            assert np.isnan(value) or (0 <= value <= 1)


class GlobalEnergyMinimization(Stage):
    """Global energy minimization stage.

    Hyperparameters (namespace ``global-energy-minimization``): ``pruning``
    ('exact' or 'isbi24', default 'exact'), ``beta`` (default 0; auto
    ``AF_beta * scale^2`` with AF_beta=0.66), ``max_iter`` (default 5),
    ``gamma`` (default 0.8), ``max_seed_distance`` (default inf; auto
    ``AF_max_seed_distance * diameter``), ``max_work_amount`` (default 1e6).
    """

    ENABLED_BY_DEFAULT = True

    def __init__(self):
        super().__init__('global-energy-minimization',
                         inputs=['y', 'y_mask', 'atoms', 'adjacencies', 'dsm_cfg'],
                         outputs=['y_img', 'cover', 'objects', 'performance'])

    def process(self, input_data, cfg, out, log_root_dir):
        y_img = Image.create_from_array(input_data['y'], normalize=False,
                                        mask=input_data['y_mask'])
        atoms = input_data['atoms']
        adjacencies = input_data['adjacencies']
        pruning = cfg.get('pruning', 'exact')
        beta = cfg.get('beta', 0)
        max_iter = cfg.get('max_iter', DEFAULT_MAX_ITER)
        gamma = cfg.get('gamma', DEFAULT_GAMMA)
        max_seed_distance = cfg.get('max_seed_distance', np.inf)
        max_work_amount = cfg.get('max_work_amount', DEFAULT_MAX_WORK_AMOUNT)

        assert 0 < gamma < 1
        assert pruning in ('exact', 'isbi24')

        dsm_cfg = copy_dict(input_data['dsm_cfg'])
        cover, objects, performance = _compute_generations(
            adjacencies, y_img, atoms, log_root_dir, pruning, dsm_cfg, beta,
            max_iter, gamma, max_seed_distance, max_work_amount, out)[2:]

        return {
            'y_img': y_img,
            'cover': cover,
            'objects': objects,
            'performance': performance,
        }

    def configure_ex(self, scale, radius, diameter):
        return {
            'beta': (scale ** 2, 0.66),
            'max_seed_distance': (diameter, np.inf),
        }


def _compute_generations(adjacencies, y_img, atoms_map, log_root_dir, pruning,
                         dsm_cfg, beta=np.nan, max_iter=DEFAULT_MAX_ITER,
                         gamma=DEFAULT_GAMMA, max_seed_distance=np.inf,
                         max_work_amount=DEFAULT_MAX_WORK_AMOUNT, out=None):
    out = get_output(out)

    atoms = []
    for atom_label in sorted(adjacencies.atom_labels):
        c = Object()
        c.footprint = {atom_label}
        atoms.append(c)
    out.write('\nIteration 1:')

    cluster_labels = sorted(adjacencies.cluster_labels)
    universes = []
    for cluster_label in cluster_labels:
        universe = Object()
        universe.footprint = set(adjacencies.get_atoms_in_cluster(cluster_label))
        universes.append(universe)
    # atoms and universes are solved in ONE batched pass (the reference runs
    # two separate Ray fan-outs, globalenergymin.py:186-199)
    compute_objects(atoms + universes, y_img, atoms_map, dsm_cfg,
                    _get_generation_log_dir(log_root_dir, 1),
                    ('Computing atom and universe costs',
                     'Atom and universe costs computed'), out=out)

    atom_by_label = {next(iter(c.footprint)): c for c in atoms}
    directly_solved_cluster_labels = set()  # solved via Criterion 2
    trivial_cluster_labels = set()          # universe cardinality 1 or 2
    for cluster_label, universe in zip(cluster_labels, universes):
        if len(universe.footprint) <= 2:
            trivial_cluster_labels |= {cluster_label}
        atoms_in_cluster = [atom_by_label[atom_label]
                            for atom_label in adjacencies.get_atoms_in_cluster(cluster_label)]
        if not all(atom.is_optimal for atom in atoms_in_cluster):
            continue
        atom_energies_sum = sum(atom.energy for atom in atoms_in_cluster)
        # decision-quantized Criterion 2 (recompile stability, _stability.py)
        if dq(universe.energy) <= dq(beta + atom_energies_sum):
            directly_solved_cluster_labels |= {cluster_label}

    cover = MinSetCover(atoms, beta, adjacencies, max_iter=max_iter, gamma=gamma)
    cover.update(universes, get_output(None).derive(muted=True))
    costs = [cover.costs]
    out.write(f'Solution costs: {costs[-1]:,g}')
    out.write(f'Clusters solved directly: {len(directly_solved_cluster_labels)} / '
              f'{len(cluster_labels)}')
    performance = PerformanceReport(
        direct_solution_trial_count=len(cluster_labels),
        direct_solution_success_count=len(directly_solved_cluster_labels))

    def __estimate_progress(**kwargs):
        return _estimate_progress(generations, adjacencies, max_seed_distance,
                                  max_amount=max_work_amount, skip_last=True, **kwargs)

    generations = [atoms]
    objects = atoms + universes
    performance.nontrivial_object_count = __estimate_progress(
        ignored_cluster_labels=trivial_cluster_labels)[1]
    performance.overall_object_count = performance.nontrivial_object_count + len(objects)
    performance.iterative_object_count = __estimate_progress(
        ignored_cluster_labels=directly_solved_cluster_labels)[1]
    performance.overall_computed_object_count = len(objects)

    if len(directly_solved_cluster_labels) < len(cluster_labels):
        while True:
            generation_number = 1 + len(generations)
            generation_label = f'Iteration {generation_number}'
            out.write('')
            out.intermediate(f'{generation_label}...')

            finished_amount, remaining_amount = __estimate_progress(
                ignored_cluster_labels=directly_solved_cluster_labels)
            total_amount = finished_amount + remaining_amount
            progress_text = ('progress unknown' if np.isnan(total_amount)
                             else f'(finished '
                                  f'{100 * finished_amount / total_amount:.0f}% '
                                  f'or more)')
            out.write(f'{generation_label}: {Text.style(progress_text, Text.BOLD)}')

            new_generation, new_objects = _process_generation(
                cover, objects, generations[-1], y_img, atoms_map, adjacencies,
                dsm_cfg, max_seed_distance,
                _get_generation_log_dir(log_root_dir, generation_number),
                pruning, directly_solved_cluster_labels, out)
            objects += new_objects
            performance.iterative_computed_object_count += len(new_objects)

            if len(new_generation) == 0:
                break
            generations.append(new_generation)

            cover.update(new_generation, get_output(None).derive(muted=True))
            costs.append(cover.costs)
            out.write(f'Solution costs: {costs[-1]:,g}')

    performance.nontrivial_computed_object_count += performance.iterative_computed_object_count
    performance.overall_computed_object_count += performance.iterative_computed_object_count
    performance._assert_integrity()

    out.write('')
    out.write(f'Non-trivial pruning: {100 * performance.nontrivial_pruning_success:.1f}% '
              f'(computed {performance.nontrivial_computed_object_count} / '
              f'{performance.nontrivial_object_count})')
    return generations, costs, cover, objects, performance


def _get_max_distance(footprint, new_atom_label, adjacencies):
    """Maximum distance between the new atom's seed and the footprint seeds."""
    assert new_atom_label not in footprint
    if not footprint:  # keep the pre-vectorization contract (benign 0)
        return 0.0
    new_atom_seed = np.asarray(adjacencies.get_seed(new_atom_label), float)
    seeds = np.asarray([adjacencies.get_seed(label) for label in footprint],
                       float)
    return float(np.linalg.norm(seeds - new_atom_seed, axis=1).max())


def _is_within_max_seed_distance(footprint, new_atom_label, adjacencies, max_seed_distance):
    if np.isinf(max_seed_distance):
        return True
    return _get_max_distance(footprint, new_atom_label, adjacencies) <= max_seed_distance


def _iterate_generation(previous_generation, adjacencies, max_seed_distance,
                        get_footprint=lambda item: item, ignored_cluster_labels=set(),
                        skip_last=False):
    """Yields ``(item, new_footprint, new_atom_label)`` for each deduplicated
    one-atom extension of the previous generation's footprints
    (cf. ``/root/reference/superdsm/globalenergymin.py:292-307``)."""
    existing_footprints = set()
    for item in previous_generation:
        footprint = get_footprint(item)
        cluster_label = adjacencies.get_cluster_label(next(iter(footprint)))
        if cluster_label in ignored_cluster_labels:
            continue
        if skip_last and len(footprint) + 1 == len(adjacencies.get_atoms_in_cluster(cluster_label)):
            continue
        adjacent_atoms = set()
        for atom in footprint:
            adjacent_atoms |= adjacencies[atom] - footprint
        for new_atom_label in sorted(adjacent_atoms):
            if not _is_within_max_seed_distance(footprint, new_atom_label,
                                                adjacencies, max_seed_distance):
                continue
            new_footprint = frozenset(footprint | {new_atom_label})
            if new_footprint not in existing_footprints:
                existing_footprints |= {new_footprint}
                yield item, new_footprint, new_atom_label


def _get_next_generation(previous_generation, adjacencies, max_seed_distance, **kwargs):
    return [new_footprint for _, new_footprint, _ in
            _iterate_generation(previous_generation, adjacencies, max_seed_distance, **kwargs)]


def _estimate_progress(generations, adjacencies, max_seed_distance,
                       max_amount=DEFAULT_MAX_WORK_AMOUNT,
                       ignored_cluster_labels=set(), skip_last=False):
    """Work-amount estimate; raises if it could exceed ``max_amount``
    (cf. ``/root/reference/superdsm/globalenergymin.py:314-323``)."""
    previous_generation = [c.footprint for c in generations[-1]]
    remaining_amount = 0
    while len(previous_generation) > 0:
        next_generation = _get_next_generation(
            previous_generation, adjacencies, max_seed_distance,
            ignored_cluster_labels=ignored_cluster_labels, skip_last=skip_last)
        remaining_amount += len(next_generation)
        previous_generation = next_generation
        if remaining_amount > max_amount:
            raise ValueError('estimated work amount is too large')
    finished_amount = len(sum(generations, []))
    return finished_amount, remaining_amount


def _process_generation(cover, objects, previous_generation, y, atoms_map,
                        adjacencies, dsm_cfg, max_seed_distance, log_root_dir,
                        pruning, ignored_cluster_labels, out):
    """Builds, prunes, and batch-solves the next generation of candidates
    (cf. ``/root/reference/superdsm/globalenergymin.py:326-368``)."""
    new_objects = []
    new_objects_energy_thresholds = []
    discarded = 0
    current_cluster_label = None
    for obj, new_object_footprint, new_atom_label in _iterate_generation(
            previous_generation, adjacencies, max_seed_distance,
            lambda c: c.footprint, ignored_cluster_labels, skip_last=True):
        cluster_label = adjacencies.get_cluster_label(next(iter(obj.footprint)))
        if current_cluster_label != cluster_label:
            current_cluster_label = cluster_label
            current_cluster_costs = cover.get_cluster_costs(cluster_label)

        new_object = Object()
        new_object.footprint = new_object_footprint
        new_object.init_from = obj  # warm-start from the parent's solution

        if pruning == 'exact':
            remaining_atoms = adjacencies.get_atoms_in_cluster(cluster_label) - new_object_footprint
            min_remaining_atom_costs = sum(cover.get_atom(atom_label).energy
                                           for atom_label in remaining_atoms)
            new_object_maxsetpack = sum(c.energy for c in solve_maxsetpack(
                [c for c in objects if c.is_optimal and c.footprint.issubset(new_object.footprint)],
                out=get_output(None).derive(muted=True)))
            min_new_object_costs = cover.beta + max(
                obj.energy + cover.get_atom(new_atom_label).energy, new_object_maxsetpack)
            max_new_object_costs = current_cluster_costs - min_remaining_atom_costs
            # decision-quantized pruning bound (recompile stability):
            # discarding is conservative, so a stable-near-tie keeps the
            # candidate (it is then pruned or kept by its own solved energy)
            if dq(max_new_object_costs) < dq(min_new_object_costs):
                discarded += 1
            else:
                new_objects_energy_thresholds.append(max_new_object_costs - cover.beta)
                new_objects.append(new_object)
        elif pruning == 'isbi24':
            new_objects_energy_thresholds.append(
                obj.energy + cover.get_atom(new_atom_label).energy + cover.beta)
            new_objects.append(new_object)
        else:
            raise ValueError(f'Unknown pruning mode "{pruning}"')

    compute_objects(new_objects, y, atoms_map, dsm_cfg, log_root_dir, out=out)

    next_generation = []
    for new_object_idx, new_object in enumerate(new_objects):
        # decision-quantized survival threshold (recompile stability)
        if dq(new_object.energy) < dq(new_objects_energy_thresholds[new_object_idx]):
            next_generation.append(new_object)
        else:
            discarded += 1
            new_object.fg_fragment = None  # only footprint + energy still needed
        new_object.cidx = new_object_idx
    out.write(f'Next iteration: {len(next_generation)} ({discarded} discarded, {pruning} pruning)')
    return next_generation, new_objects
