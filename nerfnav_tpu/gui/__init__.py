from nerfnav_tpu.gui.viewer import NeRFGUI, OrbitCamera

__all__ = ["NeRFGUI", "OrbitCamera"]
