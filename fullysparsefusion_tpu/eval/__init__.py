from .detection import DetectionRecord, evaluate_detections
