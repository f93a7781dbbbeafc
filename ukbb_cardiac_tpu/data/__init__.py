"""Data acquisition / preparation layer (reference ``data/``)."""

from ukbb_cardiac_tpu.data.biobank import (
    BaseImage,
    Biobank_Dataset,
    process_manifest,
)
from ukbb_cardiac_tpu.data.cvi42 import parseFile, parse_workspace
from ukbb_cardiac_tpu.data.dicom import dcmread, dcmwrite_minimal, is_dicom_file
from ukbb_cardiac_tpu.data.prepare import (
    extract_ed_es_frames,
    find_annotated_ed_es,
    link_annotated_subjects,
    link_split,
    quality_control_subjects,
    split_dataset,
)
from ukbb_cardiac_tpu.data.propagate_aortic import (
    build_propagation_plan,
    infer_time_frame,
    propagate_subject,
    wrap_frame_index,
)
