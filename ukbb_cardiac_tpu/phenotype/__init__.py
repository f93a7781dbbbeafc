"""Clinical phenotype analysis — the cardiac_utils.py equivalent layer.

Volumes / areas are device-friendly reductions; geometry (contours, AHA
coordinates, wall thickness, area–length) stays host-side — outputs are
tiny and the hot path of the pipeline is segmentation + registration.
"""

from ukbb_cardiac_tpu.phenotype.aha import (
    determine_aha_coordinate_system,
    determine_aha_part,
    determine_aha_segment_id,
    determine_aha_segment_ids,
)
from ukbb_cardiac_tpu.phenotype.aorta import (
    aortic_area_measures,
    evaluate_aortic_area_dataset,
    load_central_pulse_pressure,
)
from ukbb_cardiac_tpu.phenotype.atrium import (
    atrial_volume_measures,
    evaluate_atrial_area_length,
    evaluate_atrial_volume_dataset,
)
from ukbb_cardiac_tpu.phenotype.bullseye import bulls_eye_canvas, plot_bulls_eye
from ukbb_cardiac_tpu.phenotype.contours import approximate_contour, extract_contour
from ukbb_cardiac_tpu.phenotype.qc import (
    aorta_pass_quality_control,
    atrium_pass_quality_control,
    la_pass_quality_control,
    sa_pass_quality_control,
)
from ukbb_cardiac_tpu.phenotype.ventricle import (
    evaluate_ventricular_volume_dataset,
    ventricular_volume_measures,
)
from ukbb_cardiac_tpu.phenotype.wall_thickness import evaluate_wall_thickness
