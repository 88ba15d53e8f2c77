"""Staged segmentation pipeline with partial execution.

Counterpart of the reference's ``superdsm/pipeline.py``
(``/root/reference/superdsm/pipeline.py:10-265``): stages declare inputs and
outputs, :func:`create_pipeline` topologically orders them,
:meth:`Pipeline.process_image` supports ``first_stage``/``last_stage`` partial
execution with carried-over ``data``, and each stage exposes a
scale-dependent auto-configuration protocol (:meth:`Stage.configure`).
"""

import math
import time

import numpy as np

from .output import get_output
from .image import normalize_image
from ._aux import mkdir


class Stage(object):
    """A pipeline stage with a hyperparameter namespace and declared I/O.

    :param name: Readable identifier.
    :param cfgns: Hyperparameter namespace (defaults to ``name``).
    :param inputs: Keys this stage consumes from the pipeline data object.
    :param outputs: Keys this stage adds to the pipeline data object.

    Subclasses implement :meth:`process` and may override
    :meth:`configure_ex` to declare scale-dependent hyperparameter defaults
    (each entry ``key -> (factor, default_user_factor[, spec])``, where the
    effective value is ``factor * AF_key`` and ``spec`` may clamp
    type/min/max — same protocol as the reference,
    ``/root/reference/superdsm/pipeline.py:102-118``).
    """

    ENABLED_BY_DEFAULT = True

    def __init__(self, name, cfgns=None, inputs=[], outputs=[]):
        if cfgns is None:
            cfgns = name
        self.name = name
        self.cfgns = cfgns
        self.inputs = dict([(key, key) for key in inputs])
        self.outputs = dict([(key, key) for key in outputs])
        self._callbacks = {}

    def _callback(self, name, *args, **kwargs):
        for cb in self._callbacks.get(name, []):
            cb(name, *args, **kwargs)

    def add_callback(self, name, cb):
        self._callbacks.setdefault(name, []).append(cb)

    def remove_callback(self, name, cb):
        if name in self._callbacks:
            self._callbacks[name].remove(cb)

    def __call__(self, data, cfg, out=None, log_root_dir=None):
        out = get_output(out)
        cfg = cfg.get(self.cfgns, {})
        if cfg.get('enabled', self.ENABLED_BY_DEFAULT):
            out.intermediate(f'Starting stage "{self.name}"')
            self._callback('start', data)
            input_data = {}
            for data_key, input_data_key in self.inputs.items():
                input_data[input_data_key] = data[data_key]
            t0 = time.time()
            output_data = self.process(input_data, cfg=cfg, out=out, log_root_dir=log_root_dir)
            dt = time.time() - t0
            assert len(set(output_data.keys()) ^ set(self.outputs)) == 0, \
                f'stage "{self.name}" generated unexpected output'
            for output_data_key, data_key in self.outputs.items():
                data[data_key] = output_data[output_data_key]
            self._callback('end', data)
            return dt
        else:
            out.write(f'Skipping disabled stage "{self.name}"')
            self._callback('skip', data)
            return 0

    def process(self, input_data, cfg, out, log_root_dir):
        """Runs this stage. Returns a dict of the declared outputs."""
        raise NotImplementedError()

    def configure(self, scale):
        """Scale-dependent defaults; ``radius = sqrt(2)*scale``,
        ``diameter = 2*radius`` (cf. ``/root/reference/superdsm/pipeline.py:84-100``)."""
        radius = scale * math.sqrt(2)
        diameter = 2 * radius
        return self.configure_ex(scale, radius, diameter)

    def configure_ex(self, scale, radius, diameter):
        return dict()


class ProcessingControl:

    def __init__(self, first_stage=None, last_stage=None):
        self.started = first_stage is None
        self.first_stage = first_stage
        self.last_stage = last_stage

    def step(self, stage):
        if not self.started and stage == self.first_stage:
            self.started = True
        do_step = self.started
        if stage == self.last_stage:
            self.started = False
        return do_step


class Pipeline:
    """An ordered list of stages operated on a shared data dictionary."""

    def __init__(self):
        self.stages = []

    def process_image(self, g_raw, cfg, first_stage=None, last_stage=None, data=None,
                      out=None, log_root_dir=None):
        """Segments an image.

        :return: ``(data, cfg, timings)`` — the pipeline data object with all
            intermediate and final results, the hyperparameters used, and the
            per-stage wall-clock timings in seconds.

        With ``first_stage`` set, ``data`` from a previous run must be passed
        and earlier stages are skipped (the batch pickup mechanism).
        """
        cfg = cfg.copy()
        if log_root_dir is not None:
            mkdir(log_root_dir)
        if first_stage == self.stages[0].name and data is None:
            first_stage = None
        if first_stage is not None and first_stage.endswith('+'):
            first_stage = self.stages[1 + self.find(first_stage[:-1])].name
        if first_stage is not None and last_stage is not None and \
                self.find(first_stage) > self.find(last_stage):
            return data, cfg, {}
        out = get_output(out)
        ctrl = ProcessingControl(first_stage, last_stage)
        if ctrl.step('init'):
            data = self.init(g_raw, cfg)
        else:
            assert data is not None, 'data argument must be provided if first_stage is used'
        timings = {}
        for stage in self.stages:
            if ctrl.step(stage.name):
                dt = stage(data, cfg, out=out, log_root_dir=log_root_dir)
                timings[stage.name] = dt
        return data, cfg, timings

    def init(self, g_raw, cfg):
        """Normalizes ``g_raw`` to [0, 1]; inverts histological RGB images.

        Non-finite pixels (dead/hot camera pixels) are replaced by the median
        of the finite pixels BEFORE normalization — a single inf otherwise
        collapses the normalization to zeros and silently produces an empty
        segmentation (the reference behaves that way,
        ``/root/reference/superdsm/image.py:48``; sanitizing only non-finite
        inputs leaves every valid image bit-identical)."""
        g_raw = np.asarray(g_raw)
        finite = np.isfinite(g_raw)
        if not finite.all():
            fill = np.median(g_raw[finite]) if finite.any() else 0.0
            g_raw = np.where(finite, g_raw, fill)
        if cfg.get('histological', False):
            g_rgb = g_raw
            g_raw = g_raw.mean(axis=2)
            g_raw = g_raw.max() - g_raw
        else:
            g_rgb = None
        data = dict(g_raw=normalize_image(g_raw))
        if g_rgb is not None:
            data['g_rgb'] = g_rgb
        return data

    def find(self, stage_name, not_found_dummy=np.inf):
        """Position of the stage named ``stage_name`` (or ``not_found_dummy``)."""
        try:
            return [stage.name for stage in self.stages].index(stage_name)
        except ValueError:
            return not_found_dummy

    def append(self, stage, after=None):
        if after is None:
            self.stages.append(stage)
        else:
            if isinstance(after, str):
                after = self.find(after)
            self.stages.insert(after + 1, stage)


def create_pipeline(stages):
    """Builds a :class:`Pipeline`, ordering stages by their declared I/O."""
    available_inputs = set(['g_raw'])
    remaining_stages = list(stages)

    pipeline = Pipeline()
    while len(remaining_stages) > 0:
        next_stage = None
        for stage in remaining_stages:
            if frozenset(stage.inputs.keys()).issubset(available_inputs):
                next_stage = stage
                break
        if next_stage is None:
            raise ValueError('failed to resolve total ordering')
        remaining_stages.remove(next_stage)
        pipeline.append(next_stage)
        available_inputs |= frozenset(next_stage.outputs.keys())

    return pipeline


def create_default_pipeline():
    """The default five-stage pipeline (preprocess → dsm → c2f → gem → post)."""
    from .preprocess import Preprocessing
    from .dsmcfg import DSM_Config
    from .c2freganal import C2F_RegionAnalysis
    from .globalenergymin import GlobalEnergyMinimization
    from .postprocess import Postprocessing

    stages = [
        Preprocessing(),
        DSM_Config(),
        C2F_RegionAnalysis(),
        GlobalEnergyMinimization(),
        Postprocessing(),
    ]

    return create_pipeline(stages)
