"""Batch system: hierarchical ``task.json`` tasks, pickup/resume, reports.

Counterpart of the reference's ``superdsm/batch.py``
(``/root/reference/superdsm/batch.py:29-570``): tasks are directories with a
``task.json`` spec inheriting from their parents; results are pickled per
task; completion is tracked by MD5 config digests; reruns pick up mid-pipeline
from the first stage whose configuration differs. The reference's per-task
``ray.init`` cluster is unnecessary here — the device is fed by the batched
solver — but the fork-per-task isolation of the CLI is retained so one
failing task cannot corrupt the queue.

PROVENANCE / compatibility note: this module is deliberately a
*behavior-compatible port*, not a redesign. The ``task.json`` schema, the
on-disk artifact layout (``data.dill.gz``, ``.digest`` + ``.digest.cfg.json``,
``timings.csv``/``.timings.json``, ``performance.csv``, ``env.csv``,
tar-gzipped logs), the pickup rules, and the CLI flags ARE the compatibility
surface a reference user depends on when switching frameworks — changing
their structure would break existing task trees and tooling for no TPU
benefit (this is host-side orchestration; the TPU-first redesign lives in
the solver/pipeline layers). Where behavior could be improved without
breaking the surface, it was: sorted-key config digests, threaded
host/device-overlapped file processing (``SUPERDSM_TPU_TASK_THREADS``),
``--no-fork``, and a testable ``run_cli``.

CLI: ``python -m superdsm_tpu.batch <rootpath> --run``.
"""

import csv
import gzip
import json
import os
import pathlib
import shutil
import sys
import tarfile
import time

import dill
import numpy as np

from .pipeline import create_default_pipeline
from ._aux import mkdir, is_subpath, copy_dict
from .output import get_output, Text
from .io import imread, imsave
from .render import (rasterize_labels, render_ymap, render_atoms,
                     render_adjacencies, render_result_over_image)
from .automation import create_config
from .config import Config
from .globalenergymin import PerformanceReport


def _format_runtime(seconds):
    seconds = int(round(seconds))
    hours, remainder = divmod(seconds, 3600)
    minutes, seconds = divmod(remainder, 60)
    return f'{hours:02}:{minutes:02}:{seconds:02}'


def _resolve_pathpattern(pathpattern, fileid):
    if pathpattern is None:
        return None
    return str(pathpattern) % fileid


def _process_file(dry, *args, out=None, **kwargs):
    if dry:
        out = get_output(out)
        kwargs_serializable = copy_dict(kwargs)
        if 'cfg' in kwargs_serializable:
            kwargs_serializable['cfg'] = kwargs_serializable['cfg'].entries
        out.write(f'_process_file: {json.dumps(kwargs_serializable, default=str)}')
        return None, {}
    return __process_file(*args, out=out, **kwargs)


def __process_file(pipeline, data, img_filepath, overlay_filepath, seg_filepath,
                   seg_border, log_filepath, adj_filepath, cfg_filepath, cfg,
                   first_stage, last_stage, rasterize_kwargs, out=None):
    for filepath in (seg_filepath, adj_filepath, log_filepath, cfg_filepath,
                     overlay_filepath):
        if filepath is not None:
            mkdir(pathlib.Path(filepath).parents[0])

    if data is None and first_stage is not None:
        # the pickup task error-skipped this file (its data entry is None,
        # e.g. scale estimation failed there but may succeed on this
        # backend/config): there is nothing to resume from, so process the
        # file from scratch instead of tripping the pipeline's data-required
        # assertion
        first_stage = None

    histological = cfg.get('histological', False)
    imread_kwargs = {}
    if histological:
        imread_kwargs['as_gray'] = False

    g_raw = imread(img_filepath, **imread_kwargs)
    out = get_output(out)

    timings = {}
    if first_stage != '':
        out.intermediate('Creating configuration...')
        t0 = time.time()
        if histological:
            g_gray = g_raw.mean(axis=2)
            g_gray = g_gray.max() - g_gray
        else:
            g_gray = g_raw
        cfg, scale = create_config(pipeline, cfg, g_gray)
        timings['autocfg'] = time.time() - t0
        if cfg_filepath is not None:
            with open(cfg_filepath, 'w') as fout:
                cfg.dump_json(fout)
        if scale is not None:
            out.write(f'Estimated scale: {scale:.2f}')

    def write_adjacencies_image(name, data):
        if adj_filepath is not None:
            ymap = render_ymap(data)
            ymap = render_atoms(data, override_img=ymap, border_color=(0, 0, 0),
                                border_radius=1)
            img = render_adjacencies(data, override_img=ymap, edge_color=(0, 1, 0),
                                     endpoint_color=(0, 1, 0))
            imsave(adj_filepath, img)

    atomic_stage = pipeline.stages[pipeline.find('c2f-region-analysis')]
    atomic_stage.add_callback('end', write_adjacencies_image)
    result_data, _, _timings = pipeline.process_image(
        g_raw, data=data, cfg=cfg, first_stage=first_stage, last_stage=last_stage,
        log_root_dir=log_filepath, out=out)
    atomic_stage.remove_callback('end', write_adjacencies_image)
    timings.update(_timings)

    if overlay_filepath is not None:
        if seg_border is None:
            seg_border = 8
        img_overlay = render_result_over_image(result_data, border_width=seg_border)
        imsave(overlay_filepath, img_overlay)

    if seg_filepath is not None:
        seg_result = rasterize_labels(result_data, **rasterize_kwargs)
        imsave(seg_filepath, seg_result)

    return result_data, timings


def find_first_differing_stage(pipeline, config1, config2):
    """Name of the first pipeline stage whose config entries differ
    (cf. ``/root/reference/superdsm/batch.py:99-109``); '' if none differ."""
    assert isinstance(config1, dict)
    assert isinstance(config2, dict)
    stage_names = [stage.name for stage in pipeline.stages]
    if config1.get('AF_scale', None) != config2.get('AF_scale', None):
        return stage_names[0]
    for stage_name in stage_names:
        in1, in2 = stage_name in config1, stage_name in config2
        if in1 != in2 or (in1 and in2 and config1[stage_name] != config2[stage_name]):
            return stage_name
    return ''


def _resolve_timings_key(key, candidates):
    for c in candidates:
        if str(c) == key:
            return c
    raise ValueError(f'cannot resolve key "{key}"')


def _find_task_rel_path(task):
    if task.parent_task is not None:
        return _find_task_rel_path(task.parent_task)
    return task.path.parents[0]


def _compress_logs(log_dir):
    if log_dir is None:
        return
    log_dir_path = pathlib.Path(log_dir)
    if not log_dir_path.exists():
        return
    assert log_dir_path.is_dir()
    with tarfile.open(f'{log_dir}.tgz', 'w:gz') as tar:
        tar.add(log_dir, arcname=os.path.sep)
    shutil.rmtree(str(log_dir))


def _write_performance_report(task_path, performance_path, data, overall_performance):
    properties = ['direct_solution_success', 'iterative_pruning_success',
                  'overall_pruning_success', 'nontrivial_pruning_success']
    fields = PerformanceReport.attributes + properties
    rows = [[str(task_path)], ['ID'] + fields]
    get_row = lambda prefix, perf: [prefix] + [getattr(perf, field) for field in fields]
    for file_id in data.keys():
        # files skipped with an error row (errors.csv) have no result
        if data[file_id] is not None and 'performance' in data[file_id]:
            rows.append(get_row(str(file_id), data[file_id]['performance']))
    rows.append(get_row('', overall_performance))
    with open(str(performance_path), 'w', newline='') as fout:
        csv_writer = csv.writer(fout, delimiter=';', quotechar='|', quoting=csv.QUOTE_MINIMAL)
        for row in rows:
            csv_writer.writerow(row)


def _write_env_report(env_path):
    with open(str(env_path), 'w', newline='') as fout:
        csv_writer = csv.writer(fout, delimiter=';', quotechar='|', quoting=csv.QUOTE_MINIMAL)
        for env_key, env_val in os.environ.items():
            csv_writer.writerow([env_key, env_val])


DATA_DILL_GZ_FILENAME = 'data.dill.gz'


def _shard_tag(index, count):
    return f'shard-{index}-of-{count}'


def parse_shard(spec):
    """Parses ``"I/N"`` into ``(index, count)`` (0-based index)."""
    index, count = (int(x) for x in str(spec).split('/'))
    if not (count >= 1 and 0 <= index < count):
        raise ValueError(f'invalid shard spec: {spec}')
    return index, count


class Task:
    """A batch processing task (a directory with a ``task.json`` spec).

    :param path: Directory of the task specification.
    :param data: The task specification (JSON data).
    :param parent_task: The parent task, or ``None``.
    """

    def __init__(self, path, data, parent_task=None):
        self.runnable = bool(data.get('runnable', False))
        self.parent_task = parent_task
        self.path = path
        self.data = Config(data) if parent_task is None else Config(parent_task.data).derive(data)
        self.rel_path = _find_task_rel_path(self)
        self.file_ids = (sorted(frozenset(self.data.entries['file_ids']))
                         if 'file_ids' in self.data else None)
        self.img_pathpattern = self.data.update(
            'img_pathpattern', lambda p: str(self.resolve_path(p)))

        if 'base_config_path' in self.data:
            base_config_path = self.resolve_path(self.data['base_config_path'])
            with base_config_path.open('r') as base_config_fin:
                base_config = json.load(base_config_fin)
            parent_config = parent_task.data.get('config', Config())
            if isinstance(parent_config, dict):
                parent_config = Config(parent_config)
            self.data['config'] = parent_config.derive(base_config).merge(
                data.get('config', {})).entries
            del self.data.entries['base_config_path']

        if self.runnable:
            assert self.file_ids is not None
            assert self.img_pathpattern is not None

            concat = lambda p1, p2: (p1 / p2) if p2 is not None else None
            self.seg_pathpattern = concat(path, self.data.entries.get('seg_pathpattern', None))
            self.adj_pathpattern = concat(path, self.data.entries.get('adj_pathpattern', None))
            self.log_pathpattern = concat(path, self.data.entries.get('log_pathpattern', None))
            self.cfg_pathpattern = concat(path, self.data.entries.get('cfg_pathpattern', None))
            self.overlay_pathpattern = concat(path, self.data.entries.get('overlay_pathpattern', None))
            self.result_path = path / DATA_DILL_GZ_FILENAME
            self.timings_path = path / 'timings.csv'
            self.performance_path = path / 'performance.csv'
            self.env_path = path / 'env.csv'
            self.timings_json_path = path / '.timings.json'
            self.digest_path = path / '.digest'
            self.digest_cfg_path = path / '.digest.cfg.json'
            config = self.data.get('config', {})
            self.config = config if isinstance(config, Config) else Config(config)
            self.seg_border = self.data.entries.get('seg_border', None)
            self.dilate = self.data.entries.get('dilate', 0)
            self.merge_threshold = self.data.entries.get('merge_overlap_threshold', np.inf)
            self.last_stage = self.data.entries.get('last_stage', None)
            self.environ = self.data.entries.get('environ', {})

    def resolve_path(self, path):
        if path is None:
            return None
        path = pathlib.Path(os.path.expanduser(str(path))
                            .replace('{DIRNAME}', self.path.name)
                            .replace('{ROOTDIR}', str(self.root_path)))
        if path.is_absolute():
            return path.resolve()
        return path.resolve().relative_to(os.getcwd())

    @staticmethod
    def create_from_directory(task_dir, parent_task, override_cfg={}, force_runnable=False):
        """Loads a task from a directory containing ``task.json`` (or ``None``)."""
        task_file = task_dir / 'task.json'
        if task_file.exists():
            try:
                with task_file.open('r') as task_fin:
                    task_data = json.load(task_fin)
                if force_runnable:
                    task_data['runnable'] = True
                task = Task(task_dir, task_data, parent_task)
                for key in override_cfg:
                    setattr(task, key, override_cfg[key])
                return task
            except Exception:
                raise ValueError(f'Error processing: "{task_file}"')
        return None

    @property
    def root_path(self):
        """The root path of the task tree."""
        if self.parent_task is not None:
            return self.parent_task.root_path
        return self.path

    def _fmt_path(self, path):
        if isinstance(path, str):
            path = pathlib.Path(path)
        if self.rel_path is None:
            return str(path)
        return str(path.relative_to(self.rel_path))

    def _initialize(self):
        for key, val in self.environ.items():
            os.environ[key] = str(val)
        return create_default_pipeline()

    def _load_timings(self):
        if self.timings_json_path.exists():
            with self.timings_json_path.open('r') as fin:
                timings = json.load(fin)
            return {_resolve_timings_key(key, self.file_ids): timings[key] for key in timings}
        return {}

    @property
    def config_digest(self):
        """MD5 digest of the task's hyperparameters."""
        return self.config.md5.hexdigest()

    @property
    def is_pending(self):
        """Whether the task still needs to run (digest mismatch or absent)."""
        return self.runnable and not (self.digest_path.exists()
                                      and self.digest_path.read_text() == self.config_digest)

    # ------------------------------------------------------------------
    # Multi-host dispatch (host-level data parallelism over images).
    #
    # The reference distributes work within one host via Ray's shared-nothing
    # task model (``/root/reference/superdsm/batch.py:258-263``); across
    # hosts, the TPU-native equivalent is file striping over a shared
    # filesystem: host i of n runs ``--shard i/n`` (processing
    # ``file_ids[i::n]`` and writing per-shard result/digest sidecars), and
    # any host afterwards runs ``--merge-shards n`` to combine them into the
    # standard task artifacts. No network transport is needed — images are
    # independent, exactly like the reference's Ray tasks.
    # ------------------------------------------------------------------

    def shard_result_path(self, index, count):
        return self.path / f'data.{_shard_tag(index, count)}.dill.gz'

    def shard_digest_path(self, index, count):
        return self.path / f'.digest.{_shard_tag(index, count)}'

    def shard_timings_path(self, index, count):
        return self.path / f'.timings.{_shard_tag(index, count)}.json'

    def is_pending_shard(self, index, count):
        p = self.shard_digest_path(index, count)
        return self.runnable and not (p.exists()
                                      and p.read_text() == self.config_digest)

    def merge_shards(self, count, out=None):
        """Combines the ``count`` per-shard results into the standard task
        artifacts (``data.dill.gz``, timings, performance, digest).

        Idempotent: a task whose digest is already current and whose shard
        sidecars are gone (a previous merge consumed them) is skipped, so a
        re-run after a partial multi-task merge picks up where it left off."""
        out = get_output(out)
        sidecars = [i for i in range(count)
                    if self.shard_result_path(i, count).exists()]
        if not sidecars and not self.is_pending:
            out.write(f'Skipping merge (already merged): {self._fmt_path(self.path)}')
            return None
        missing = [i for i in range(count)
                   if not self.shard_result_path(i, count).exists()
                   or self.is_pending_shard(i, count)]
        if missing and not self.is_pending:
            # The task digest is current (a previous merge completed), yet
            # some sidecars exist and some don't. Two legitimate causes, and
            # one resolution handles both: merge the sidecars whose shard
            # digest is CURRENT over the existing data.dill.gz (a leftover
            # from a merge that crashed mid-cleanup re-merges idempotently;
            # a shard the user re-ran with --force after the merge gets
            # incorporated instead of silently discarded), and drop sidecars
            # with a missing/stale shard digest (partial writes).
            merge_ids = [i for i in sidecars if not self.is_pending_shard(i, count)]
            stale = [i for i in sidecars if i not in merge_ids]
            for i in stale:
                self.shard_result_path(i, count).unlink(missing_ok=True)
                self.shard_digest_path(i, count).unlink(missing_ok=True)
                self.shard_timings_path(i, count).unlink(missing_ok=True)
                (self.path / f'errors.{_shard_tag(i, count)}.csv').unlink(
                    missing_ok=True)
            if not merge_ids:
                out.write(f'Skipping merge (already merged; removed '
                          f'{len(stale)} stale sidecar(s)): '
                          f'{self._fmt_path(self.path)}')
                return None
            out.write(f'Re-merging {len(merge_ids)} shard sidecar(s) over the '
                      f'existing result: {self._fmt_path(self.path)}')
        elif missing:
            raise RuntimeError(f'{self._fmt_path(self.path)}: shards not ready '
                               f'(missing or stale: {missing} of {count})')
        else:
            merge_ids = list(range(count))
        # start from the existing task result (if any): shards that skipped
        # writing (e.g. pickup at/after postprocess) contribute empty
        # sidecars, and the unsharded path preserves the old data.dill.gz in
        # that situation — the merge must not replace it with gaps
        data, timings = {}, self._load_timings()
        if self.result_path.exists():
            with gzip.open(self.result_path, 'rb') as fin:
                data = dill.load(fin)
        for i in merge_ids:
            # a shard sidecar covers exactly its file stripe (or is empty for
            # a run that skipped writing), so its entries replace the stripe
            # VERBATIM — including None for files that error-skipped in a
            # re-run, mirroring the unsharded path (which dumps `data`
            # wholesale); filtering Nones here would resurrect a stale result
            # for a file whose re-run failure is recorded in errors.csv
            with gzip.open(self.shard_result_path(i, count), 'rb') as fin:
                data.update(dill.load(fin))
            p = self.shard_timings_path(i, count)
            if p.exists():
                with p.open('r') as fin:
                    shard_timings = json.load(fin)
                timings.update({_resolve_timings_key(k, self.file_ids): v
                                for k, v in shard_timings.items()})
        data = {fid: data.get(fid) for fid in self.file_ids}
        performance = PerformanceReport()
        for fid in self.file_ids:
            if data[fid] is not None and 'performance' in data[fid]:
                performance += data[fid]['performance']
        if timings:
            self.write_timings(timings)
        with gzip.open(self.result_path, 'wb') as fout:
            dill.dump(data, fout, byref=True)
        with self.digest_cfg_path.open('w') as fout:
            self.config.dump_json(fout)
        _write_performance_report(
            self.path, self.performance_path,
            {fid: v for fid, v in data.items()
             if v is not None and 'performance' in v},
            performance)
        _write_env_report(self.env_path)
        self.digest_path.write_text(self.config_digest)
        # fold per-shard error sidecars into errors.csv: a merged shard's
        # rows replace any previous rows for its file stripe
        error_rows = {}
        main_errors_path = self.path / 'errors.csv'
        if main_errors_path.exists():
            with main_errors_path.open('r', newline='') as fin:
                rows = list(csv.reader(fin))[1:]
            error_rows = {row[0]: row[1] for row in rows if len(row) == 2}
        for i in merge_ids:
            stripe = {str(fid) for fid in self.file_ids[i::count]}
            error_rows = {fid: e for fid, e in error_rows.items()
                          if fid not in stripe}
            sidecar = self.path / f'errors.{_shard_tag(i, count)}.csv'
            if sidecar.exists():
                with sidecar.open('r', newline='') as fin:
                    rows = list(csv.reader(fin))[1:]
                error_rows.update({row[0]: row[1] for row in rows
                                   if len(row) == 2})
                sidecar.unlink()
        if error_rows:
            with main_errors_path.open('w', newline='') as fout:
                writer = csv.writer(fout)
                writer.writerow(['file_id', 'error'])
                writer.writerows(sorted(error_rows.items()))
        else:
            main_errors_path.unlink(missing_ok=True)
        for i in merge_ids:
            self.shard_result_path(i, count).unlink()
            self.shard_digest_path(i, count).unlink()
            self.shard_timings_path(i, count).unlink(missing_ok=True)
        out.write(f'Merged {len(merge_ids)} shard(s): '
                  f'{self._fmt_path(self.result_path)}')
        return data

    def run(self, task_info=None, dry=False, verbosity=0, force=False, one_shot=False,
            debug=False, report=None, pickup=True, out=None, shard=None):
        out = get_output(out)
        if not self.runnable:
            return
        pending = self.is_pending if shard is None else self.is_pending_shard(*shard)
        if not force and not pending:
            out.write(f'\nSkipping task: {self._fmt_path(self.path)} '
                      f'{"" if task_info is None else f"({task_info})"}')
            return
        if self.last_stage is not None:
            task_info = (f'{task_info}, ' if task_info is not None else '') + \
                f'last stage: {self.last_stage}'
        if shard is not None:
            task_info = (f'{task_info}, ' if task_info is not None else '') + \
                f'shard {shard[0] + 1}/{shard[1]}'
        out.write(Text.style(f'\nEntering task: {self._fmt_path(self.path)} '
                             f'{"" if task_info is None else f"({task_info})"}', Text.BLUE))
        out2 = out.derive(margin=2)
        pipeline = self._initialize()
        assert self.last_stage is None or self.last_stage == '' or \
            not np.isinf(pipeline.find(self.last_stage)), f'unknown stage "{self.last_stage}"'
        try:
            first_stage, data = self.find_first_stage_name(pipeline, dry, pickup, out=out2)
            out3 = out2.derive(margin=2, muted=(verbosity <= -int(not dry)))
            timings = self._load_timings()
            performance = PerformanceReport()
            file_ids = (self.file_ids if shard is None
                        else self.file_ids[shard[0]::shard[1]])

            def _file_kwargs(file_id):
                kwargs = dict(img_filepath=str(self.img_pathpattern) % file_id,
                              seg_filepath=_resolve_pathpattern(self.seg_pathpattern, file_id),
                              adj_filepath=_resolve_pathpattern(self.adj_pathpattern, file_id),
                              log_filepath=_resolve_pathpattern(self.log_pathpattern, file_id),
                              cfg_filepath=_resolve_pathpattern(self.cfg_pathpattern, file_id),
                              overlay_filepath=_resolve_pathpattern(self.overlay_pathpattern, file_id),
                              rasterize_kwargs=dict(merge_overlap_threshold=self.merge_threshold,
                                                    dilate=self.dilate),
                              seg_border=self.seg_border,
                              last_stage=self.last_stage,
                              cfg=self.config.copy())
                if self.last_stage is not None and \
                        pipeline.find(self.last_stage) < pipeline.find('postprocess'):
                    kwargs['seg_filepath'] = None
                return kwargs

            def _finish_file(file_id, result, _timings):
                data[file_id] = result
                if file_id not in timings:
                    timings[file_id] = {}
                timings[file_id].update(_timings)
                if not dry and result is not None and 'performance' in result:
                    nonlocal_performance[0] += result['performance']

            def _process_file_resilient(file_id, *args, **kwargs):
                """Per-file fault isolation: a blob-free image makes scale
                estimation raise (automation.py); the reference kills the
                whole forked task on that (batch.py exits 1). We instead
                record an error row and keep processing the remaining files
                — a deliberate improvement over the reference behavior."""
                try:
                    return _process_file(*args, **kwargs)
                except ValueError as error:
                    if 'scale estimation failed' not in str(error):
                        raise
                    file_errors.append((file_id, str(error)))
                    out3.write(Text.style(
                        f'Error (skipped): {str(self.img_pathpattern) % file_id}'
                        f' — {error}', Text.RED))
                    return None, {}

            file_errors = []
            nonlocal_performance = [performance]
            for file_id in file_ids:
                if file_id not in data:
                    data[file_id] = None

            n_threads = int(os.environ.get('SUPERDSM_TPU_TASK_THREADS', '3'))
            if not dry and n_threads > 1 and len(file_ids) > 1:
                # host/device-overlapped file stream (superdsm_tpu.parallel.
                # pipelined rationale): image i's host phases (watershed,
                # combinatorics, rendering) run while image j's batched
                # solves occupy the device. Each worker thread uses its own
                # pipeline instance (__process_file mutates stage callbacks).
                import threading
                from concurrent.futures import ThreadPoolExecutor
                local = threading.local()

                def _worker(file_id):
                    if not hasattr(local, 'pipeline'):
                        local.pipeline = self._initialize()
                    kwargs = _file_kwargs(file_id)
                    # overlapped file processing saturates the device — skip
                    # the latency-oriented c2f split-tree speculation (see
                    # superdsm_tpu.parallel.pipelined)
                    kwargs['cfg'].set_default('c2f-region-analysis/speculate', False)
                    result, _timings = _process_file_resilient(
                        file_id,
                        dry, local.pipeline, data[file_id], first_stage=first_stage,
                        out=out3.derive(muted=True), **kwargs)
                    _compress_logs(_resolve_pathpattern(self.log_pathpattern, file_id))
                    return file_id, result, _timings

                done = 0
                with ThreadPoolExecutor(max_workers=n_threads) as pool:
                    for file_id, result, _timings in pool.map(_worker, file_ids):
                        _finish_file(file_id, result, _timings)
                        done += 1
                        if report is not None:
                            report.update(self, done / len(file_ids))
                        out3.write(Text.style(f'[{self._fmt_path(self.path)}] ',
                                              Text.BLUE + Text.BOLD)
                                   + f'Processed file: {str(self.img_pathpattern) % file_id}'
                                   f' ({done} / {len(file_ids)})')
            else:
                for file_idx, file_id in enumerate(file_ids):
                    progress = file_idx / len(file_ids)
                    if report is not None:
                        report.update(self, progress)
                    out3.write(Text.style(f'\n[{self._fmt_path(self.path)}] ',
                                          Text.BLUE + Text.BOLD)
                               + Text.style(f'Processing file: '
                                            f'{str(self.img_pathpattern) % file_id}', Text.BOLD)
                               + f' ({100 * progress:.0f}%)')
                    kwargs = _file_kwargs(file_id)
                    result, _timings = _process_file_resilient(
                        file_id, dry, pipeline, data[file_id],
                        first_stage=first_stage, out=out3, **kwargs)
                    if not dry:
                        _compress_logs(kwargs['log_filepath'])
                    _finish_file(file_id, result, _timings)
            performance = nonlocal_performance[0]
            if not dry:
                # per-shard error sidecars avoid clobbering across hosts;
                # a clean re-run removes a stale errors file
                errors_path = self.path / (
                    'errors.csv' if shard is None
                    else f'errors.{_shard_tag(*shard)}.csv')
                if file_errors:
                    with errors_path.open('w', newline='') as fout:
                        writer = csv.writer(fout)
                        writer.writerow(['file_id', 'error'])
                        writer.writerows(file_errors)
                    out2.write(Text.style(
                        f'{len(file_errors)} file(s) skipped with errors '
                        f'(see {errors_path.name})', Text.RED))
                else:
                    errors_path.unlink(missing_ok=True)
            out2.write('')
            if report is not None:
                report.update(self, 'active')
            if not dry and not np.isnan(performance.nontrivial_pruning_success):
                out2.write(Text.style('Non-trivial pruning: ', Text.BOLD)
                           + f'{100 * performance.nontrivial_pruning_success:.1f}% '
                           f'(computed {performance.nontrivial_computed_object_count} / '
                           f'{performance.nontrivial_object_count})')

            skip_writing_results_conditions = [
                one_shot,
                self.last_stage is not None
                and pipeline.find(self.last_stage) <= pipeline.find('dsm')
                and not self.result_path.exists(),
                first_stage is not None
                and pipeline.find(first_stage) >= pipeline.find('postprocess'),
            ]
            wrote_shard_result = False
            if any(skip_writing_results_conditions):
                out2.write('Skipping writing results')
                # a shard must still complete (digest + sidecar) or it would
                # re-run forever and merge_shards could never proceed; an
                # empty sidecar contributes nothing to the merge — matching
                # the unsharded path, which marks the digest without writing
                # results
                if shard is not None and not dry and not one_shot:
                    with gzip.open(self.shard_result_path(*shard), 'wb') as fout:
                        dill.dump({}, fout)
                    wrote_shard_result = True
            elif shard is not None:
                # shard sidecars only; the standard task artifacts are
                # produced by merge_shards once every shard has finished
                if not dry:
                    result_path = self.shard_result_path(*shard)
                    out2.intermediate(f'Writing results... {self._fmt_path(result_path)}')
                    with gzip.open(result_path, 'wb') as fout:
                        dill.dump({fid: data.get(fid) for fid in file_ids},
                                  fout, byref=True)
                    with self.shard_timings_path(*shard).open('w') as fout:
                        json.dump({str(k): timings[k] for k in file_ids
                                   if k in timings}, fout)
                    out2.write(Text.style('Results written to: ', Text.BOLD)
                               + self._fmt_path(result_path))
                    wrote_shard_result = True
            else:
                if not dry:
                    self.write_timings(timings)
                    out2.intermediate(f'Writing results... {self._fmt_path(self.result_path)}')
                    with gzip.open(self.result_path, 'wb') as fout:
                        dill.dump(data, fout, byref=True)
                    with self.digest_cfg_path.open('w') as fout:
                        self.config.dump_json(fout)
                    _write_performance_report(self.path, self.performance_path, data, performance)
                    _write_env_report(self.env_path)
                out2.write(Text.style('Results written to: ', Text.BOLD)
                           + self._fmt_path(self.result_path))
            if not dry and not one_shot:
                if shard is not None:
                    # a shard digest without its result sidecar would wedge
                    # merge_shards (fresh digest + missing file): only mark
                    # the shard done when its sidecar was actually written
                    if wrote_shard_result:
                        self.shard_digest_path(*shard).write_text(self.config_digest)
                else:
                    self.digest_path.write_text(self.config_digest)
            return data
        except Exception:
            out.write(Text.style(f'\nError while processing task: {self._fmt_path(self.path)}',
                                 Text.RED))
            raise

    def find_runnable_parent_task(self):
        if self.parent_task is None:
            return None
        if self.parent_task.runnable:
            return self.parent_task
        return self.parent_task.find_runnable_parent_task()

    def find_parent_task_with_result(self):
        runnable_parent_task = self.find_runnable_parent_task()
        if runnable_parent_task is None:
            return None
        if runnable_parent_task.result_path.exists():
            return runnable_parent_task
        return runnable_parent_task.find_parent_task_with_result()

    def find_pickup_candidates(self, pipeline):
        pickup_candidates = []
        previous_task = self.find_parent_task_with_result()
        if previous_task is not None:
            first_stage = find_first_differing_stage(pipeline, self.config.entries,
                                                     previous_task.config.entries)
            pickup_candidates.append((previous_task, first_stage))
        if self.result_path.exists() and self.digest_cfg_path.exists():
            with self.digest_cfg_path.open('r') as fin:
                config = json.load(fin)
            first_stage = find_first_differing_stage(pipeline, self.config.entries, config)
            pickup_candidates.append((self, first_stage))
        return pickup_candidates

    def find_best_pickup_candidate(self, pipeline):
        pickup_candidates = self.find_pickup_candidates(pipeline)
        if len(pickup_candidates) == 0:
            return None, None
        scores = [pipeline.find(first_stage) for task, first_stage in pickup_candidates]
        return pickup_candidates[int(np.argmax(scores))]

    def find_first_stage_name(self, pipeline, dry=False, pickup=True, out=None):
        """Determines the stage to start from (pickup; cf.
        ``/root/reference/superdsm/batch.py:393-405``)."""
        out = get_output(out)
        pickup_task, stage_name = (self.find_best_pickup_candidate(pipeline)
                                   if pickup else (None, None))
        if pickup_task is None or pipeline.find(stage_name) <= pipeline.find('dsm') + 1:
            return None, {}
        out.write(f'Picking up from: {self._fmt_path(pickup_task.result_path)} '
                  f'({stage_name if stage_name != "" else "load"})')
        if not dry:
            with gzip.open(pickup_task.result_path, 'rb') as fin:
                data = dill.load(fin)
            return stage_name, data
        return stage_name, {}

    def write_timings(self, timings):
        file_ids = timings.keys()
        stage_names = sorted(list(timings.values())[0].keys())
        rows = [[str(self.path)], ['ID'] + stage_names + ['total']]
        totals = np.zeros(len(stage_names) + 1)
        for file_id in file_ids:
            vals = [timings[file_id].get(stage_name, 0) for stage_name in stage_names]
            vals += [sum(vals)]
            rows.append([file_id] + [_format_runtime(val) for val in vals])
            totals += np.asarray(vals)
        rows.append([''] + [_format_runtime(val) for val in totals])
        with self.timings_path.open('w', newline='') as fout:
            csv_writer = csv.writer(fout, delimiter=';', quotechar='|',
                                    quoting=csv.QUOTE_MINIMAL)
            for row in rows:
                csv_writer.writerow(row)
        with self.timings_json_path.open('w') as fout:
            json.dump({str(k): v for k, v in timings.items()}, fout)


class BatchLoader:
    """Recursively discovers tasks below a root directory."""

    def __init__(self, override_cfg={}):
        self.tasks = []
        self.override_cfg = override_cfg

    def load(self, path):
        """Loads all tasks from the root directory ``path``."""
        root_path = pathlib.Path(path)
        self._process_directory(root_path)

    def _process_directory(self, current_dir, parent_task=None):
        task = Task.create_from_directory(current_dir, parent_task, self.override_cfg)
        if task is not None:
            self.tasks.append(task)
            parent_task = task
        for d in sorted(os.listdir(current_dir)):
            f = current_dir / d
            if f.is_dir():
                self._process_directory(f, parent_task)


def get_path(root_path, path):
    if isinstance(root_path, str):
        root_path = pathlib.Path(root_path)
    if isinstance(path, str):
        path = pathlib.Path(path)
    if path.is_absolute():
        return path
    return pathlib.Path(root_path) / path


class StatusReport:
    """Live status file of the batch queue (pending/active/done/error)."""

    def __init__(self, scheduled_tasks, filepath=None):
        self.scheduled_tasks = scheduled_tasks
        self.filepath = filepath
        self.status = dict()
        self.task_progress = None

    def get_task_status(self, task):
        return self.status.get(str(task.path), 'skipped')

    def update(self, task, status, save=True):
        if isinstance(status, float):
            self.task_progress = status
            status = 'active'
        else:
            self.task_progress = None
        assert status in ('pending', 'done', 'active', 'error')
        if status in ('done', 'active') and self.get_task_status(task) == 'skipped':
            return
        self.status[str(task.path)] = status
        if save:
            self.save()

    def save(self):
        if self.filepath is None:
            return
        with open(str(self.filepath), 'w') as fout:
            skipped_tasks = []
            for task in self.scheduled_tasks:
                status = self.get_task_status(task)
                prefix, suffix = '', ''
                if status == 'skipped':
                    skipped_tasks.append(task)
                    continue
                elif status == 'pending':
                    prefix = ' o '
                elif status == 'done':
                    prefix = ' ✓ '
                elif status == 'active':
                    prefix = '-> '
                elif status == 'error':
                    prefix = 'EE '
                if status == 'active' and self.task_progress is not None:
                    suffix = f' ({100 * self.task_progress:.0f}%)'
                fout.write(f'{prefix}{task.path}{suffix}\n')
            if len(skipped_tasks) > 0:
                fout.write('\nSkipped tasks:\n')
                for task in skipped_tasks:
                    fout.write(f'- {str(task.path)}\n')


def run_cli(args=None):
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('path', help='root directory for batch processing')
    parser.add_argument('--run', help='run batch processing', action='store_true')
    parser.add_argument('--verbosity', help='positive (negative) is more (less) verbose',
                        type=int, default=0)
    parser.add_argument('--force', help='do not skip tasks', action='store_true')
    parser.add_argument('--oneshot', help='do not save results or mark tasks as processed',
                        action='store_true')
    parser.add_argument('--last-stage', help='override the "last_stage" setting',
                        type=str, default=None)
    parser.add_argument('--fresh', help='do not pick up previous results', action='store_true')
    parser.add_argument('--task', help='run only the given task', type=str,
                        default=[], action='append')
    parser.add_argument('--task-dir', help='run only the given task and its sub-directories',
                        type=str, default=[], action='append')
    parser.add_argument('--debug', help='verbose serial diagnostics', action='store_true')
    parser.add_argument('--no-fork', help='run tasks in-process (no per-task fork isolation)',
                        action='store_true')
    parser.add_argument('--report', help='report current status to file', type=str,
                        default='/tmp/superdsm-status')
    parser.add_argument('--shard', help='process only file stripe I/N of each task '
                        '(host-level data parallelism over a shared filesystem; '
                        'run --merge-shards N afterwards)', type=str, default=None)
    parser.add_argument('--merge-shards', help='merge N per-shard results into the '
                        'standard task artifacts', type=int, default=None)
    args = parser.parse_args(args)

    if args.last_stage is not None and not args.oneshot:
        parser.error('Using "--last-stage" only allowed if "--oneshot" is used')
    if args.shard is not None and args.merge_shards is not None:
        parser.error('"--shard" and "--merge-shards" are mutually exclusive')
    shard = parse_shard(args.shard) if args.shard is not None else None

    override_cfg = dict()
    if args.last_stage is not None:
        override_cfg['last_stage'] = args.last_stage

    loader = BatchLoader(override_cfg=override_cfg)
    loader.load(args.path)

    args.task = [get_path(args.path, task_path) for task_path in args.task]
    args.task_dir = [get_path(args.path, task_dir_path) for task_dir_path in args.task_dir]

    dry = not args.run
    out = get_output()
    runnable_tasks = [task for task in loader.tasks if task.runnable]
    out.write(f'Loaded {len(runnable_tasks)} runnable task(s)')
    if dry:
        out.write('DRY RUN: use "--run" to run the tasks instead')
    scheduled_tasks = []
    run_task_count = 0
    pending_tasks_count = 0
    report = StatusReport(scheduled_tasks, filepath=None if dry else args.report)
    for task in runnable_tasks:
        if (len(args.task) > 0 or len(args.task_dir) > 0) and \
                all(task.path != path for path in args.task) and \
                all(not is_subpath(path, task.path) for path in args.task_dir):
            continue
        scheduled_tasks.append(task)
        if (task.is_pending if shard is None else task.is_pending_shard(*shard)) \
                or args.force:
            pending_tasks_count += 1
            report.update(task, 'pending', save=False)
    if args.merge_shards is not None:
        for task in scheduled_tasks:
            if dry:
                # dry-run contract: report readiness, touch nothing
                n = args.merge_shards
                ready = [i for i in range(n)
                         if task.shard_result_path(i, n).exists()
                         and not task.is_pending_shard(i, n)]
                merged = len(ready) == 0 and not task.is_pending
                out.write(f'{task._fmt_path(task.path)}: '
                          + ('already merged' if merged
                             else f'{len(ready)} / {n} shard(s) ready to merge'))
            else:
                task.merge_shards(args.merge_shards, out=out)
        return
    for task in scheduled_tasks:
        if (task.is_pending if shard is None else task.is_pending_shard(*shard)) \
                or args.force:
            run_task_count += 1
            task_info = f'{run_task_count} of {pending_tasks_count}'
        else:
            task_info = None
        report.update(task, 'active')
        if args.no_fork:
            try:
                task.run(task_info, dry, args.verbosity, args.force, args.oneshot,
                         args.debug, report, not args.fresh, out, shard=shard)
                report.update(task, 'done')
            except Exception:
                report.update(task, 'error')
                raise
        else:
            newpid = os.fork()
            if newpid == 0:
                try:
                    task.run(task_info, dry, args.verbosity, args.force, args.oneshot,
                             args.debug, report, not args.fresh, out, shard=shard)
                except Exception:
                    report.update(task, 'error')
                    import traceback
                    traceback.print_exc()
                    os._exit(1)
                os._exit(0)
            else:
                if os.waitpid(newpid, 0)[1] != 0:
                    out.write('An error occurred: interrupting')
                    sys.exit(1)
                else:
                    report.update(task, 'done')
    out.write(f'\nRan {run_task_count} task(s) out of {len(runnable_tasks)} in total')


if __name__ == '__main__':
    run_cli()
