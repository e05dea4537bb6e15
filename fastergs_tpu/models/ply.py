"""PLY export/import with the standard 3DGS attribute layout.

Equivalent of the reference's as_ply_dict + the host's PLY writer
(reference: Model.py:506-537): x,y,z, f_dc_*, f_rest_* (channel-major),
opacity/scales pre-activation, normalized quaternion. Includes a minimal
binary-little-endian PLY writer/reader so the framework is standalone.
"""

from __future__ import annotations

import numpy as np


def gaussians_to_ply_dict(gaussians) -> dict:
    if gaussians.n_active == 0:
        return {}
    means = np.asarray(gaussians.means)
    # channel-major flattening: transpose(1, 2) then flatten (Model.py:514-515)
    sh_0 = np.asarray(gaussians.sh_coefficients_0).transpose(0, 2, 1).reshape(means.shape[0], -1)
    sh_rest = np.asarray(gaussians.sh_coefficients_rest).transpose(0, 2, 1).reshape(means.shape[0], -1)
    opacities = np.asarray(gaussians.raw_opacities).reshape(means.shape[0], 1)
    scales = np.asarray(gaussians.raw_scales)
    rotations = np.asarray(gaussians.rotations)
    attributes = np.concatenate(
        (means, sh_0, sh_rest, opacities, scales, rotations), axis=1)

    attribute_names = (
        ['x', 'y', 'z']
        + ['f_dc_0', 'f_dc_1', 'f_dc_2']
        + [f'f_rest_{i}' for i in range(sh_rest.shape[-1])]
        + ['opacity']
        + ['scale_0', 'scale_1', 'scale_2']
        + ['rot_0', 'rot_1', 'rot_2', 'rot_3']
    )
    full_dtype = [(name, 'f4') for name in attribute_names]
    vertices = np.empty(means.shape[0], dtype=full_dtype)
    for i, name in enumerate(attribute_names):
        vertices[name] = attributes[:, i]
    return {'vertex': vertices}


def write_ply(path: str, ply_dict: dict) -> None:
    """Writes a {'vertex': structured array, 'comments': [...]} dict."""
    vertices = ply_dict['vertex']
    comments = ply_dict.get('comments', [])
    with open(path, 'wb') as f:
        header = ['ply', 'format binary_little_endian 1.0']
        header += [f'comment {c}' for c in comments]
        header.append(f'element vertex {len(vertices)}')
        header += [f'property float {name}' for name in vertices.dtype.names]
        header.append('end_header')
        f.write(('\n'.join(header) + '\n').encode('ascii'))
        f.write(vertices.tobytes())


def read_ply(path: str) -> dict:
    """Reads a binary-little-endian PLY with float vertex properties."""
    with open(path, 'rb') as f:
        comments, names, n_vertices = [], [], 0
        while True:
            line = f.readline().decode('ascii').strip()
            if line == 'end_header':
                break
            if line.startswith('comment '):
                comments.append(line[len('comment '):])
            elif line.startswith('element vertex '):
                n_vertices = int(line.split()[-1])
            elif line.startswith('property float '):
                names.append(line.split()[-1])
        dtype = np.dtype([(n, '<f4') for n in names])
        vertices = np.frombuffer(f.read(dtype.itemsize * n_vertices),
                                 dtype=dtype)
    return {'vertex': vertices, 'comments': comments}


def ply_dict_to_param_arrays(ply_dict: dict, sh_degree: int = 3) -> dict:
    """Inverse of gaussians_to_ply_dict: structured array → parameter dict."""
    v = ply_dict['vertex']
    n = len(v)
    means = np.stack([v['x'], v['y'], v['z']], axis=-1)
    sh0 = np.stack([v['f_dc_0'], v['f_dc_1'], v['f_dc_2']], axis=-1)[:, None, :]
    n_rest = (sh_degree + 1) ** 2 - 1
    rest_cols = [v[f'f_rest_{i}'] for i in range(3 * n_rest)]
    # channel-major on disk: (3, n_rest) per point → transpose back
    sh_rest = np.stack(rest_cols, axis=-1).reshape(n, 3, n_rest).transpose(0, 2, 1)
    opacities = v['opacity'][:, None]
    scales = np.stack([v['scale_0'], v['scale_1'], v['scale_2']], axis=-1)
    rotations = np.stack([v['rot_0'], v['rot_1'], v['rot_2'], v['rot_3']], axis=-1)
    return {
        'means': means.astype(np.float32),
        'sh_coefficients_0': sh0.astype(np.float32),
        'sh_coefficients_rest': sh_rest.astype(np.float32),
        'opacities': opacities.astype(np.float32),
        'scales': scales.astype(np.float32),
        'rotations': rotations.astype(np.float32),
    }
